# Convenience targets (the Python package needs no build; the native IO
# library compiles itself on demand — see cudasw4_tpu/native/__init__.py).

.PHONY: test test-tpu bench native peakbench clean

test:
	python -m pytest tests/ -q

# Run the suite against the real TPU instead of the CPU interpreter.
test-tpu:
	CUDASW4_TPU_TEST_TPU=1 python -m pytest tests/ -q

bench:
	python bench.py

peakbench:
	benchmarks/runpeakbenchmark.sh

native:
	g++ -O3 -std=c++17 -shared -fPIC cudasw4_tpu/native/io.cpp \
	    -o cudasw4_tpu/native/libtpusw_io.so -lz

clean:
	rm -f cudasw4_tpu/native/libtpusw_io.so
	find . -name __pycache__ -type d -exec rm -rf {} +
