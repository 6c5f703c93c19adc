# Developer ergonomics. Tests force the 8-device virtual CPU mesh via
# tests/conftest.py; bench runs on the real TPU through the session backend.

.PHONY: test test-all test-fast bench native clean

# fast default (pyproject addopts excludes the `slow` marker; <5 min)
test:
	python -m pytest tests/ -q

# everything, incl. sharding/apps/e2e/parity; run EXCLUSIVELY (concurrent
# collective tests can contend on the 1-core virtual-device host). One
# pytest process PER MODULE: a monolithic 415-test process has segfaulted
# at exit-adjacent teardown (torch-inductor + jax-CPU extension interaction
# after ~200 C extensions load); per-module isolation is immune and every
# module is known-green standalone.
# Retry policy (scoped, round 3): XLA-CPU's in-process runtime has aborted
# a pytest process mid-module (observed once in test_e2e after 4 green
# tests; 12 consecutive standalone reruns could not reproduce it — see
# NOTES.md round-3 journal). A retry happens ONLY on abnormal termination
# (rc >= 128, i.e. the process died on a signal/abort, not a test result);
# ordinary pytest failures (rc 1-5) fail the run immediately, so a flaky
# TEST can never hide behind the retry.
test-all:
	@set -e; for m in tests/test_*.py; do \
	  echo "== $$m"; \
	  rc=0; python -m pytest $$m -q -m '' || rc=$$?; \
	  if [ $$rc -ge 128 ]; then \
	    echo "== $$m died on signal (rc=$$rc): retrying once"; \
	    python -m pytest $$m -q -m '' || exit 1; \
	  elif [ $$rc -ne 0 ]; then exit $$rc; fi; \
	done

test-fast:
	python -m pytest tests/test_transport.py tests/test_models.py -q

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 lumina_t2x_tpu/native/image_loader.cpp \
	  -o lumina_t2x_tpu/native/_image_loader.so -ljpeg -lpng -lz

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f lumina_t2x_tpu/native/_image_loader.so
