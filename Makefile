.PHONY: test test-fast lint bench entry multichip cpp clean

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -n 4

lint:
	bash scripts/lint.sh

bench:
	python bench.py

entry:
	python __graft_entry__.py

multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py multichip 8

cpp:
	$(MAKE) -C cpp

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf build dist *.egg-info
