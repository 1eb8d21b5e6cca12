# Native host-side runtime (sypha_tpu.native loads this with ctypes and
# falls back to numpy implementations when the library is absent).
# The reference's counterpart is its whole nvcc Makefile; here only the
# host-side pieces are native — the compute path is JAX/XLA/Pallas.

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -std=c++17 -fPIC -Wall -Wextra

LIB := sypha_tpu/libsypha_host.so

all: $(LIB)

$(LIB): csrc/sypha_host.cpp
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

test: $(LIB)
	python -m pytest tests/ -q

clean:
	rm -f $(LIB)

.PHONY: all test clean
