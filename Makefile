# Pre-snapshot gate (VERDICT r3 task 2): NEVER commit a round snapshot
# without `make check` passing.  Round 3 died on an untested final commit —
# the CPU suite was red and the on-chip path crashed, and both went
# unnoticed because nothing forced a run.
#
#   make check        CPU suite (xdist-sharded, ~25-30 min) + on-chip selftest
#   make check-cpu    CPU suite only (no TPU needed)
#   make check-chip   on-chip selftest only (tunneled TPU; ~2 min + compiles)
#
# The on-chip set mirrors bench.py's tpu_selftest: Pallas kernels
# (test_fused, test_norms), attention incl. the splash-inside-while_loop
# trace-reuse case (test_attention), and the tiny end-to-end sampler run
# (test_onchip).

#   make check-fast   CPU suite minus @pytest.mark.slow (~<8 min) — the
#                     tier a reviewer can run inside a 10-minute window

PY ?= python

.PHONY: check check-cpu check-fast check-chip

check: check-cpu check-chip

check-cpu:
	$(PY) -m pytest tests/ -q

check-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

check-chip:
	LANPAINT_TEST_TPU=1 $(PY) -m pytest tests/test_onchip.py \
	    tests/test_attention.py tests/test_norms.py tests/test_fused.py \
	    -q -n 0 -p no:cacheprovider
