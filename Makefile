# Developer entry points (mirrors the reference's Makefile tiers, SURVEY §4)

.PHONY: test test-fast bench quality lint typecheck

test:            ## full CPU suite (Pallas interpret + virtual multi-chip)
	python -m pytest tests/ -q

test-fast:       ## skip the slow end-to-end / parallel tiers
	python -m pytest tests/ -q --ignore=tests/test_parallel.py --ignore=tests/test_examples.py

bench:           ## one-line JSON benchmark on the attached TPU
	python bench.py

quality:         ## posterior-recovery evaluation (OU + LV) on the TPU
	python benchmarks/quality_eval.py both

lint:
	python -m compileall -q viforsdes_tpu

typecheck:       ## hardware-free typing tier (mypy --strict if installed, else typeguard runtime enforcement over the live path)
	python tools/typecheck.py
