# Developer ergonomics. Tests force the 8-device virtual CPU mesh via
# tests/conftest.py; bench runs on the real TPU through the session backend.

.PHONY: test test-all test-fast bench native clean

# fast default (pyproject addopts excludes the `slow` marker; <5 min)
test:
	python -m pytest tests/ -q

# everything, incl. sharding/apps/e2e/parity; run EXCLUSIVELY (concurrent
# collective tests can contend on the 1-core virtual-device host)
test-all:
	python -m pytest tests/ -q -m ''

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
