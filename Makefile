# Developer entry points for the monodepth_tpu framework.

.PHONY: test test-all bench native clean verify-smoke

test:
	python -m pytest tests/ -q

# Includes the slow oracle-regeneration tests that re-derive the committed
# golden fixtures (tests/golden) from the torch oracle.
test-all:
	python -m pytest tests/ -q -m ''

test-fast:
	python -m pytest tests/ -q -x -k "not parity and not training and not parallel"

# Curated <=5-min tier: one high-value test per subsystem (incl. literal
# parity, mesh equality, CLI e2e) — see tests/conftest.py SMOKE_TESTS.
test-smoke:
	python -m pytest tests/ -q -m smoke

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

# End-to-end smoke on the reference asset corpus (requires the mounted
# /root/reference assets and a live accelerator; see .claude/skills/verify).
verify-smoke:
	python run_mars_depth.py \
	  --input "/root/reference/assets/rover" \
	  --output_dir /tmp/verify_smoke --max_size 256 --batch_size 4 --benchmark
