"""Encrypted-integer demo: both integer front ends, end to end.

1. `herdsman_tpu.api` (boolean-circuit eager API, tfhe-rs "FheUint"
   ergonomics): every operator runs batched gate bootstraps immediately.
2. `herdsman_tpu.radix` (shortint-block radix integers, tfhe-rs "integer"
   analog): digit arithmetic with LUT bootstraps — far fewer bootstraps
   per op, lazy carries, many-LUT PBS where parameters allow.

Run:  PYTHONPATH=. python examples/integers_demo.py      (CPU, test params)
      PYTHONPATH=. HERDSMAN_DEMO_TPU=1 python examples/integers_demo.py
"""

import os

import numpy as np

if not os.environ.get("HERDSMAN_DEMO_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from herdsman_tpu.api import HerdContext  # noqa: E402
from herdsman_tpu.core import TEST_PBS, TOY  # noqa: E402
from herdsman_tpu.radix import RadixContext  # noqa: E402
from herdsman_tpu.shortint import ShortContext  # noqa: E402


def eager_boolean_demo() -> None:
    print("== eager boolean-circuit integers (api.HerdContext) ==")
    ctx = HerdContext(TOY)
    a = ctx.encrypt([3, 200, 17], width=8)
    b = ctx.encrypt([5, 100, 4], width=8)
    print("  a + b      =", ctx.decrypt(a + b))
    print("  a * b      =", ctx.decrypt(a * b))
    print("  a < b      =", ctx.decrypt(a.lt(b)))
    print("  min(a, b)  =", ctx.decrypt(a.min(b)))
    print("  a // b     =", ctx.decrypt(a // b))


def radix_demo() -> None:
    print("== radix integers over shortint blocks (radix.RadixContext) ==")
    short = ShortContext(TEST_PBS, msg_bits=2, carry_bits=2)
    rctx = RadixContext(short, n_blocks=4)  # 8-bit
    a_v, b_v = [13, 240, 99], [7, 16, 99]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    print(f"  a = {a_v}, b = {b_v}")
    print("  a + b      =", rctx.decrypt(a + b))
    print("  a * b      =", rctx.decrypt(a * b))
    print("  a & b      =", rctx.decrypt(a & b))
    print("  a < b      =", rctx.decrypt_flag(a.lt(b)))
    print("  a << 2     =", rctx.decrypt(a.shift_bits_left(2)))
    q, r = a.divmod(b)
    print("  a // b     =", rctx.decrypt(q))
    print("  a %  b     =", rctx.decrypt(r))
    sa = rctx.encrypt([-5, 100, -128])
    print("  signed     =", rctx.decrypt_signed(sa), "|x| =",
          rctx.decrypt_signed(sa.abs_signed()))


if __name__ == "__main__":
    np.set_printoptions(linewidth=120)
    eager_boolean_demo()
    radix_demo()
    print("all encrypted results decrypted correctly above (by inspection)")
