"""Multi-HOST (multi-process) dryrun: 2 CPU processes x 4 virtual devices
each, joined into one 8-device mesh via jax.distributed.initialize.

Proves the process-group path of SURVEY.md section 2c (the DCN story —
collectives crossing a process boundary) without real hardware: the
distributed QAP-division FFT runs sharded over the GLOBAL mesh, its
ppermute exchanges crossing the process boundary, and process 0
value-checks the gathered result against the pure-host oracle.

    python scripts/multihost_dryrun.py            # launcher (spawns 2)
    python scripts/multihost_dryrun.py --worker N # one process (internal)
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COORD = "127.0.0.1:52121"
NPROC = 2
DEV_PER_PROC = 4
N = 16
CURVE = "bls12-377"


def worker(pid: int) -> int:
    import jax

    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=pid
    )
    import random

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as PS

    sys.path.insert(0, REPO)
    from zecale_tpu.ff import fp_jax, params as P
    from zecale_tpu.parallel import fft_dist, sharded
    from zecale_tpu.poly.domain_host import domain

    assert len(jax.devices()) == NPROC * DEV_PER_PROC, (
        f"expected {NPROC * DEV_PER_PROC} global devices, got "
        f"{len(jax.devices())}"
    )
    r = P.CURVES[CURVE].r
    F = fp_jax.field(r)
    rng = random.Random(11)
    vals = [rng.randrange(r) for _ in range(N)]
    host = np.asarray(F.pack(vals))

    mesh = sharded.make_mesh(NPROC * DEV_PER_PROC)
    sh = NamedSharding(mesh, PS(sharded.AXIS, None))
    arr = jax.make_array_from_callback(
        host.shape, sh, lambda idx: host[idx]
    )
    out = fft_dist.ifft_sharded(mesh, arr, r)
    gathered = multihost_utils.process_allgather(out, tiled=True)

    if pid == 0:
        d = domain(N, r)
        rev = fft_dist.bitrev_permutation(N)
        expect = d.ifft(vals)
        got = F.unpack(jnp.asarray(gathered))
        assert got == [expect[rev[i]] for i in range(N)], (
            "multi-process sharded iFFT diverges from host oracle"
        )
        print(
            f"MULTIHOST OK: {NPROC} processes x {DEV_PER_PROC} devices, "
            f"cross-process ppermute iFFT value-matches the host oracle",
            flush=True,
        )
    return 0


def launcher() -> int:
    env_base = {
        k: v
        for k, v in os.environ.items()
        if "AXON" not in k and not k.startswith("PALLAS_")
    }
    env_base["PYTHONPATH"] = REPO
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC} "
        "--xla_cpu_copy_insertion_use_region_analysis=false "
        "--xla_llvm_disable_expensive_passes=true"
    )
    procs = []
    for pid in range(NPROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(pid)],
                env=env_base,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    rc = 0
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        rc |= p.returncode
    sys.stdout.write(outs[0][-2000:])
    if rc == 0 and "MULTIHOST OK" in outs[0]:
        print("launcher: all processes green")
        return 0
    for i, o in enumerate(outs):
        sys.stderr.write(f"--- worker {i} tail ---\n{o[-2000:]}\n")
    return 1


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2])))
    sys.exit(launcher())
