# merpcr-tpu build/test harness (parity with reference Makefile:18-45)

PY ?= python
# CPU-only jax for tests/fuzz: blanking PALLAS_AXON_POOL_IPS skips the
# axon (remote-TPU tunnel) sitecustomize registration entirely — a fresh
# axon claim can block for many minutes while a killed process's device
# lease drains, and CPU runs never need the tunnel.
CPUENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-unit test-integration test-cli test-parallel test-perf \
        bench bench-gate fuzz scaling baseline deps native clean help

help:
	@echo "targets: test test-unit test-integration test-cli test-parallel"
	@echo "         test-perf bench bench-gate fuzz scaling baseline deps native clean"

test:
	$(CPUENV) $(PY) -m pytest tests/ -q

test-unit:
	$(CPUENV) $(PY) -m pytest tests/ -q -m unit

test-integration:
	$(CPUENV) $(PY) -m pytest tests/ -q -m integration

test-cli:
	$(CPUENV) $(PY) -m pytest tests/ -q -m cli

test-parallel:
	$(CPUENV) $(PY) -m pytest tests/ -q -m parallel

test-perf:
	$(CPUENV) $(PY) -m pytest tests/ -q -m performance

bench:
	$(PY) bench.py

# Regenerate the full TPU matrix and gate it against the committed
# artifact (structural-regression check; threshold = 2x the documented
# run-to-run noise band). On pass, commit the fresh artifact.
bench-gate:
	$(PY) bench.py --matrix /tmp/BENCH_MATRIX.new.json
	$(PY) scripts/performance_baseline.py matrix-gate \
	    --current /tmp/BENCH_MATRIX.new.json

fuzz:
	$(CPUENV) $(PY) tools/difffuzz.py 30 0

scaling:
	$(CPUENV) $(PY) tools/scaling_report.py

baseline:
	$(PY) scripts/performance_baseline.py establish

deps:
	$(PY) scripts/dependency_validation.py

native:
	$(PY) -c "from merpcr_tpu.native import get_lib; print('native codec:', bool(get_lib()))"

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f merpcr_tpu/native/libmp_fasta_codec.so
