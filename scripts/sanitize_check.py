"""Sanitizer gate for the native C engine — the TPU-native analog of the
reference's sanitizer builds (/root/reference/cmake/sanitizers.cmake:17-91,
README.md:90-99: ``-DSANITIZER=<Address|Undefined|...>`` compiles the tree
with the chosen sanitizer).

Here the native code is csrc/ (witness_engine.c + ec_engine.c, loaded via
ctypes).  This script rebuilds the engine with the requested sanitizer
(``ZECALE_NATIVE_SANITIZE`` understood by zecale_tpu.native) and drives the
hot entry points end-to-end in a CHILD interpreter:

  * batched Montgomery field ops (NativeScalarField round-trips + FFT),
  * fixed-base ladder + Pippenger MSM vs the host oracle (NativeCurve),
  * a pairing-based Groth16 verify (csrc towers + Miller loop),
  * witness hook-replay bytecode over mul/xor/unpack op kinds (a blake2s
    gadget circuit through csrc/witness_engine.c).

For Address the child runs with libasan LD_PRELOADed (the python binary is
not ASan-built, so the runtime must be first in the initial library list);
halt_on_error stops at the first report.  Exit 0 = no findings.

Usage: python scripts/sanitize_check.py [Address|Undefined]
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import hashlib
import random
import sys

sys.path.insert(0, "@REPO@")

from zecale_tpu.ff import params as P
from zecale_tpu.ec import host_curve as hc
from zecale_tpu.native import ec as nec

assert nec.available(), "sanitized native engine failed to build/load"
assert nec.sanitizer_active(), "sanitizer flags did not reach the build"

rng = random.Random(7)

# --- scalar-field ops + FFT ---
r = P.CURVES["bls12-377"].r
nf = nec.NativeScalarField(r)
xs = [rng.randrange(r) for _ in range(64)]
ys = [rng.randrange(r) for _ in range(64)]
got = nf.from_mont(nf.mul_arrays(nf.to_mont(xs), nf.to_mont(ys)))
assert list(got) == [x * y % r for x, y in zip(xs, ys)]
print("field ops clean", flush=True)

# --- curve ops: ladder + MSM vs host oracle (both base fields) ---
for name in ("bls12-377", "bw6-761"):
    crv = nec.NativeCurve(name)
    crv_h = hc.g1_curve(name)
    gen = hc.generators(name)[0]
    rr = P.CURVES[name].r
    pts = crv.fixed_base_mul_batch(
        [rng.randrange(1, rr) for _ in range(32)], gen
    )
    ss = [rng.randrange(rr) for _ in range(32)]
    assert crv.msm(ss, pts) == crv_h.msm(ss, pts), name
print("curve ops clean", flush=True)

# --- pairing-based verify (towers + Miller loop + final exp in csrc) ---
from zecale_tpu.aggregator import dummy_app as da
from zecale_tpu.snark.groth16 import Groth16

_, kp = da.dummy_app_setup("bls12-377", rng)
ep = da.dummy_app_prove("bls12-377", kp, 11, rng)
assert Groth16("bls12-377").verify(ep.inputs, ep.proof, kp.vk)
print("pairing verify clean", flush=True)

# --- witness hook-replay bytecode: blake2s drives mul/xor/unpack kinds ---
from zecale_tpu.gadgets import blake2s as b2
from zecale_tpu.gadgets.protoboard import LC, Protoboard
from zecale_tpu.native.witness import HookProgram

pb = Protoboard(r)
data = bytes(rng.randrange(256) for _ in range(32))
in_vars = pb.allocate_array(8 * len(data))
in_bits = [LC.of_var(v) for v in in_vars]
for bit in in_bits:
    pb.enforce_boolean(bit)
digest_bits = b2.blake2s_gadget(pb, in_bits)
assert HookProgram(pb).available, "witness engine must run sanitized"
bits = b2.bytes_to_bits_be(data)

def extra(w):
    for v, bit in zip(in_vars, bits):
        w[v] = bit

w = pb.generate_witness([], extra_setter=extra)
got = b2.bits_be_to_bytes([pb.lc_val(w, b) for b in digest_bits])
assert got == hashlib.blake2s(data).digest()
print("witness replay clean", flush=True)
print("SANITIZE_OK", flush=True)
"""


def main() -> int:
    kind = (sys.argv[1] if len(sys.argv) > 1 else "Undefined").lower()
    assert kind in ("address", "undefined"), kind
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child
    env["JAX_PLATFORMS"] = "cpu"
    env["ZECALE_NATIVE_SANITIZE"] = kind
    if kind == "address":
        libasan = subprocess.run(
            ["gcc", "-print-file-name=libasan.so"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        env["LD_PRELOAD"] = libasan
        # leak checking a full CPython interpreter is all interpreter
        # noise; the engine's own buffers are exercised (and freed) by
        # the drive below, and UB coverage comes from the Undefined run
        env["ASAN_OPTIONS"] = "halt_on_error=1:detect_leaks=0"
    else:
        env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    print(f"[sanitize] building + driving native engine under {kind}",
          flush=True)
    res = subprocess.run(
        [sys.executable, "-c", _CHILD.replace("@REPO@", _REPO)], env=env
    )
    if res.returncode != 0:
        print(f"[sanitize] FAILED under {kind} (exit {res.returncode})")
        return 1
    print(f"[sanitize] native engine clean under {kind}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
