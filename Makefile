# Developer entry points (the reference ships build.sh/run.sh; this is the
# Python/TPU equivalent).

.PHONY: test test-fast bench bench-build native serve serve-noop clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x

bench:            ## headline 1Mx768 benchmark on the TPU (~15 min)
	python bench.py

bench-build:      ## 10Mx768 -> 4096-centroid build benchmark (~25 min)
	python bench_build.py

native:           ## build the C++ host codec
	$(MAKE) -C vectorsearch_tpu/native

serve:            ## run the server (generates sample config on first run)
	python main.py config.json

serve-noop:       ## hermetic server with the deterministic fake embedder
	VSTPU_NOOP_AI=1 python main.py config.json

clean:
	rm -rf .cache .pytest_cache vectorsearch_tpu/native/libvscodec.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
