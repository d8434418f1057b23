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

clean:
	rm -f $(NATIVE)

.PHONY: all test bench clean
