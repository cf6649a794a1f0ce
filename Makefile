.PHONY: test test-fast bench lint clean clean-logs clean-ckpts clean-out

test:
	python -m pytest tests/ -x -q

# Fast tier: skips @pytest.mark.slow (multi-process sims, convergence runs,
# full-scale parity) — measured 5:25 (258 tests, uncontended 1-core box,
# 2026-08-21) vs ~50 min for the full suite.
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

lint:
	python -m compileall -q s2tpu tests bench.py __graft_entry__.py

clean: clean-logs clean-out

clean-logs:
	rm -rf logs/system logs/runs logs/profiles

clean-ckpts:
	rm -rf ckpts/*

clean-out:
	rm -rf out/*
