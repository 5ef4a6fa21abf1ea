# merpcr-tpu build/test harness (parity with reference Makefile:18-45)

PY ?= python

.PHONY: test test-unit test-integration test-cli test-parallel test-perf \
        bench fuzz baseline deps native clean help

help:
	@echo "targets: test test-unit test-integration test-cli test-parallel"
	@echo "         test-perf bench fuzz baseline deps native clean"

test:
	$(PY) -m pytest tests/ -q

test-unit:
	$(PY) -m pytest tests/ -q -m unit

test-integration:
	$(PY) -m pytest tests/ -q -m integration

test-cli:
	$(PY) -m pytest tests/ -q -m cli

test-parallel:
	$(PY) -m pytest tests/ -q -m parallel

test-perf:
	$(PY) -m pytest tests/ -q -m performance

bench:
	$(PY) bench.py

fuzz:
	$(PY) tools/difffuzz.py 30 0

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
