.PHONY: test bench native selftest clean

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

selftest:
	python -m mfcc_tpu.cli selftest

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
