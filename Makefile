# Common targets. Tests force a CPU backend with 8 virtual devices
# (tests/conftest.py); benches run on the real TPU.

.PHONY: test lint bench bench10m e2e

test:
	python -m pytest tests/ -q

lint:
	python -m compileall -q tpulmi tests bench.py bench_10m.py __graft_entry__.py

bench:
	python bench.py

bench10m:
	python bench_10m.py

e2e:
	python -m tpulmi.cli --synthetic 50000 --n-categories 32 --epochs 6 \
	  --lr 0.003 -bp 13 --size 100K --result-dir /tmp/tpulmi_result
