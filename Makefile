.PHONY: test test-fast bench bench-all native baseline docs clean

native:
	./native/build.sh

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

docs:
	python scripts/gen_api_docs.py

bench:
	python bench.py

bench-all:
	python scripts/bench_all.py

baseline:
	python scripts/measure_baseline.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f native/libframeio.so
