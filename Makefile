CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fPIC -shared -std=c++17

NATIVE := tntorch_tpu/_native/libtntmaxvol.so

all: $(NATIVE)

$(NATIVE): csrc/maxvol.cpp
	mkdir -p tntorch_tpu/_native
	$(CXX) $(CXXFLAGS) -o $@ $<

test:
	python -m pytest tests/ -q -n 4

test-serial:
	python -m pytest tests/ -q

bench:
	python bench.py

test-tpu:
	TNT_TPU_TESTS=1 python -m pytest tests/test_tpu_live.py -q

test-examples:
	python -m pytest tests/test_examples.py -q -n 4

clean:
	rm -f $(NATIVE)

.PHONY: all test bench test-tpu test-examples clean
