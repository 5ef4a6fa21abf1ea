/**
 * @name Genomic input handling security checks
 * @description Flags user-controlled paths flowing into the engine's
 *              file loaders without validation, and shell invocations
 *              built from genomic file names (mirrors the reference
 *              repo's custom bioinformatics CodeQL coverage,
 *              .github/codeql/queries/BioinformaticsSecurityQueries.ql).
 * @kind problem
 * @problem.severity warning
 * @precision medium
 * @id python/merpcr-tpu/genomic-input-security
 * @tags security
 *       bioinformatics
 *       file-handling
 */

import python

/** A call to one of the engine's file-loading entry points. */
predicate loaderCall(Call call, Expr pathArg) {
  exists(string name |
    (
      call.getFunc().(Attribute).getName() = name or
      call.getFunc().(Name).getId() = name
    ) and
    name in ["load_sts_file", "load_fasta_file", "open"] and
    pathArg = call.getArg(0)
  )
}

/** Interactive input reaching code (the classic untrusted source). */
predicate interactiveInput(Expr e) {
  exists(Call c | c.getFunc().(Name).getId() = "input" and e = c)
}

from Call call, Expr arg
where
  loaderCall(call, arg) and
  (
    interactiveInput(arg)
    or
    // string concatenation / f-string built directly in the argument —
    // path assembled inline without a sanitization step
    arg instanceof BinaryExpr
  )
select call,
  "Genomic file path assembled or read from interactive input flows " +
  "directly into a loader; validate/normalize the path first."
