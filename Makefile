# Build/test/bench entry points (capability twin of the reference Makefile).

.PHONY: test test-fast bench native examples clean tpu-check

# Revalidate every Pallas path on REAL hardware before trusting bench
# numbers: interpret-mode tests zero-fill scratch and so cannot catch
# stale-VMEM-class bugs by construction. Run at the start of any TPU
# session (needs the TPU tunnel up).
tpu-check:
	python tools/slab_hw_check.py
	python tools/tpu_check.py
	PYTHONPATH=.:$$PYTHONPATH python examples/toy_model.py

# -n 4 (pytest-xdist): the suite compiles ~hundreds of XLA:CPU programs;
# in ONE process the accumulated compiler state can segfault the XLA:CPU
# compiler near the end of the run (observed round 5 on two different
# tests' compiles).  Four worker processes isolate the state and are also
# ~25% faster end to end.
test:
	python -m pytest tests/ -q -n 4

test-fast:
	python -m pytest tests/ -x -q -k "not sharding"

native:
	python -c "from ppca_rs_tpu.native import packing; assert packing._get_lib() is not None, 'native build failed'; print('native packing library built')"

bench:
	python bench.py

examples:
	for f in examples/*.py; do echo "== $$f"; PYTHONPATH=.:$$PYTHONPATH python $$f || exit 1; done

clean:
	rm -f ppca_rs_tpu/native/*.so ppca_rs_tpu/native/*.so.tmp
	find . -name __pycache__ -type d -exec rm -rf {} +

install:
	pip install -e .
