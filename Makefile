# Developer entry points.
#
# IMPORTANT: CPU-only work (tests, local drives) must run with
# PALLAS_AXON_POOL_IPS unset: the image's sitecustomize otherwise registers
# the remote axon TPU backend at interpreter startup, which (a) routes every
# JAX dispatch through the TPU tunnel and (b) blocks process startup
# entirely when the tunnel is busy/wedged.  Only bench/TPU scripts should
# keep the default environment.

# --xla_cpu_copy_insertion_use_region_analysis=false: region-analysis copy
# insertion is pathologically slow on the deep while/scan bodies of the
# field kernels (measured 5x total XLA-CPU compile time);
# --xla_llvm_disable_expensive_passes trims LLVM codegen the tests don't need.
TEST_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           XLA_FLAGS="--xla_force_host_platform_device_count=8 \
           --xla_cpu_copy_insertion_use_region_analysis=false \
           --xla_llvm_disable_expensive_passes=true"

.PHONY: test test-all bench e2e dryrun sanitize

# Reference-sanitizers analog (cmake/sanitizers.cmake): rebuild csrc/ with
# ASan/UBSan and drive field/curve/pairing/witness entry points.
sanitize:
	$(TEST_ENV) python scripts/sanitize_check.py Undefined
	$(TEST_ENV) python scripts/sanitize_check.py Address

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

test-all:
	$(TEST_ENV) python -m pytest tests/ -x -q --run-slow

bench:
	python bench.py

e2e:
	python scripts/aggregate_e2e.py --batch 2

e2e-cpu:
	$(TEST_ENV) python scripts/aggregate_e2e.py --batch 1

dryrun:
	$(TEST_ENV) python __graft_entry__.py
