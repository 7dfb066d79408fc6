# Build graph — the analog of the reference's build.zig steps
# (build.zig:6-101: install/run/test/benchmarks/fmt). Python has no install
# step to speak of; `make ext` builds the native C++ fast tokenizer.

PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test fmt fmt-check benchmarks bench run ext dryrun clean

# The mesh+pallas shard_map suites (tp_pallas, dp_paged) run in their OWN
# pytest processes: at the end of a full single-process run the XLA CPU
# compiler reproducibly SEGFAULTS compiling their mesh+pallas decode ticks
# (state accumulated over ~350 earlier compiles on the 8-virtual-device
# client tips it over; both files pass in isolation). Splitting keeps the
# gate deterministic — each invocation starts from a fresh backend.
TESTS_ISOLATED = tests/test_tp_pallas.py tests/test_dp_paged.py tests/test_tp_paged.py

test:            ## run the full CPU test suite (ci.yml:12 analog)
	$(PY) -m pytest tests/ -q $(foreach f,$(TESTS_ISOLATED),--ignore=$(f))
	$(foreach f,$(TESTS_ISOLATED),$(PY) -m pytest $(f) -q &&) true

fmt:             ## format in place
	$(PY) -m ruff format llama2_tpu tests benchmarks bench.py __graft_entry__.py 2>/dev/null || \
	  echo "ruff not installed; skipping (fmt is advisory)"

fmt-check:       ## the `zig fmt --check` analog (ci.yml:20)
	@if $(PY) -c "import ruff" 2>/dev/null || command -v ruff >/dev/null 2>&1; then \
	  $(PY) -m ruff format --check llama2_tpu tests benchmarks; \
	else \
	  echo "ruff not installed; falling back to compileall"; \
	  $(PY) -m compileall -q llama2_tpu tests benchmarks; \
	fi

benchmarks:      ## per-kernel roofline microbenchmarks (benchmarks/ analog)
	$(PY) benchmarks/kernels.py
	$(PY) benchmarks/decode_profile.py

bench:           ## headline benchmark — one JSON line
	$(PY) bench.py

run:             ## generate from a checkpoint: make run CKPT=model.bin ARGS='-t 0 -n 64'
	$(PY) -m llama2_tpu $(CKPT) $(ARGS)

ext:             ## build the native C++ fast tokenizer extension
	$(PY) -c "from llama2_tpu.tokenizer.fast import _load_lib; _load_lib(); print('fast tokenizer built')"

dryrun:          ## validate multi-chip sharding on an 8-device virtual mesh
	$(CPU_ENV) $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
	rm -rf .pytest_cache
