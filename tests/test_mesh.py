"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
herd step must be BIT-IDENTICAL to the single-device path (the limb psum is
exact uint32 wraparound addition)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from herdsman_tpu.core import TOY
from herdsman_tpu.core import reference as ref
from herdsman_tpu.mesh import (
    bootstrap_bool_sharded,
    gate_step_sharded,
    make_mesh,
    shard_server_key,
)
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops.server_key import device_server_key


@pytest.fixture(scope="module")
def sharded_setup(toy_keys):
    _, sk, _ = toy_keys
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(batch=4, limb=2)
    dsk = device_server_key(sk, layouts=("bsk_conv",))
    return mesh, dsk, shard_server_key(dsk, mesh)


def test_sharded_bootstrap_bit_identical(toy_keys, sharded_setup):
    ck, sk, rng = toy_keys
    mesh, dsk, dsk_sharded = sharded_setup
    B = 8  # 2 per batch shard
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))

    single = np.asarray(
        bs.bootstrap_bool_batch(dsk, ct, engine="conv_i8")
    )
    sharded = np.asarray(
        bootstrap_bool_sharded(dsk_sharded, mesh, ct, engine="conv_i8")
    )
    np.testing.assert_array_equal(sharded, single)


def test_sharded_gate_step(toy_keys, sharded_setup):
    ck, sk, rng = toy_keys
    mesh, dsk, dsk_sharded = sharded_setup
    B = 8
    bits1 = rng.integers(0, 2, B).astype(bool)
    bits2 = rng.integers(0, 2, B).astype(bool)
    ids_np = rng.integers(0, 6, B)
    c1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
    c2 = jnp.asarray(ref.encrypt_bool(ck, bits2, rng))
    out = gate_step_sharded(
        dsk_sharded, mesh, jnp.asarray(ids_np, dtype=jnp.int32), c1, c2,
        engine="conv_i8",
    )
    got = ref.lwe_decrypt_bool(ck, np.asarray(out))
    tables = [
        lambda x, y: x & y, lambda x, y: x | y,
        lambda x, y: not (x and y), lambda x, y: not (x or y),
        lambda x, y: x ^ y, lambda x, y: not (x ^ y),
    ]
    expect = np.array(
        [bool(tables[int(g)](bool(x), bool(y)))
         for g, x, y in zip(ids_np, bits1, bits2)]
    )
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize(
    "engine", ["pallas_fused", "pallas_mega11", "pallas_mega12"])
def test_sharded_dp_fast_engine_bit_identical(toy_keys, engine):
    """Step/rotation engines — including the FLAGSHIP bench kernels
    (pallas_mega11, the headline; pallas_mega12, the N=2048 tier) — run
    per batch shard on a DP-only mesh, bit-identical to single-device.
    (unroll=True: interpret-mode pallas inside lax.scan hangs compiles.)"""
    from herdsman_tpu.ops.server_key import layouts_for_engine

    ck, sk, rng = toy_keys
    mesh = make_mesh(batch=8, limb=1)
    dsk = device_server_key(sk, layouts=layouts_for_engine(engine))
    dsk_sharded = shard_server_key(dsk, mesh)
    B = 8
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    single = np.asarray(
        bs.bootstrap_bool_batch(dsk, ct, engine=engine, unroll=True))
    sharded = np.asarray(bootstrap_bool_sharded(
        dsk_sharded, mesh, ct, engine=engine, unroll=True))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_dp_mega13_bit_identical():
    """mega13 needs byte-aligned digits (bg=2^8, l=2), so it gets its own
    param set rather than the TOY fixture; otherwise identical to the
    flagship DP bit-identity test above."""
    import dataclasses as dc

    from herdsman_tpu.ops.server_key import layouts_for_engine

    p = dc.replace(TOY, name="toy_b8l2_mesh", n=8, N=256, k=2,
                   bg_bits=8, levels=2)
    rng = np.random.default_rng(41)
    ck, sk = ref.keygen(p, rng)
    mesh = make_mesh(batch=8, limb=1)
    dsk = device_server_key(sk, layouts=layouts_for_engine("pallas_mega13"))
    dsk_sharded = shard_server_key(dsk, mesh)
    B = 8
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    single = np.asarray(
        bs.bootstrap_bool_batch(dsk, ct, engine="pallas_mega13", unroll=True))
    sharded = np.asarray(bootstrap_bool_sharded(
        dsk_sharded, mesh, ct, engine="pallas_mega13", unroll=True))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_dp_mega16_bit_identical():
    """mega16 (l=2 adjacent-pair, single-width key — the N=2048-tier
    winner, BENCH_LOG r4) DP-sharded == single-device, bit-identical;
    shard_server_key must carry the bsk_btTs layout."""
    import dataclasses as dc

    from herdsman_tpu.ops.server_key import layouts_for_engine

    p = dc.replace(TOY, name="toy_b8l2_mesh16", n=8, N=256, k=2,
                   bg_bits=8, levels=2)
    rng = np.random.default_rng(43)
    ck, sk = ref.keygen(p, rng)
    mesh = make_mesh(batch=8, limb=1)
    dsk = device_server_key(sk, layouts=layouts_for_engine("pallas_mega16"))
    dsk_sharded = shard_server_key(dsk, mesh)
    B = 8
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    single = np.asarray(
        bs.bootstrap_bool_batch(dsk, ct, engine="pallas_mega16", unroll=True))
    sharded = np.asarray(bootstrap_bool_sharded(
        dsk_sharded, mesh, ct, engine="pallas_mega16", unroll=True))
    np.testing.assert_array_equal(sharded, single)
    assert (ref.lwe_decrypt_bool(ck, single) == bits).all()


def test_plan_compiler_on_mesh_bit_identical(toy_keys):
    """BASELINE config 4: a multi-stage plan (map + reduce) executed with
    rows sharded over the mesh batch axis produces byte-identical frames
    to the single-device run."""
    from herdsman_tpu.circuit import (CircuitBuilder, ColumnMeta, DataType,
                                      ExecutionPlan, InputStage, MapperStage,
                                      OutputStage, Policy, ReduceStage)
    from herdsman_tpu.circuit.dag import DAG
    from herdsman_tpu.compiler.stages import FrameData, PlanCompiler

    ck, sk, rng = toy_keys
    dsk = device_server_key(sk, layouts=("bsk_conv",))

    cols = (ColumnMeta("a", DataType.UINT8),)
    cb = CircuitBuilder(cols)
    cb.output("x", ~cb.input_column("a"))
    map_c = cb.build()
    rb = CircuitBuilder((ColumnMeta("x", DataType.UINT8),) * 2)
    rb.output("x", rb.input_column_at(0) ^ rb.input_column_at(1))
    red_c = rb.build()

    g = DAG()
    i0 = g.emplace(InputStage("frame-0"))
    m0 = g.emplace(MapperStage(map_c))
    r0 = g.emplace(ReduceStage(red_c, Policy.SEQUENCED))
    o0 = g.emplace(OutputStage("out"))
    g.add_edge(i0, m0)
    g.add_edge(m0, r0)
    g.add_edge(r0, o0)
    plan = ExecutionPlan(0, g)

    rows = 8
    vals = rng.integers(0, 256, rows)
    bits = np.stack([
        ref.encrypt_bool(ck, (vals >> t) & 1 == 1, rng) for t in range(8)
    ], axis=1)
    frames = {"frame-0": FrameData(cols, bits.astype(np.uint32), 2)}

    single = PlanCompiler(dsk, engine="conv_i8").execute(plan, frames)
    mesh = make_mesh(batch=8, limb=1)
    sharded = PlanCompiler(dsk, engine="conv_i8", mesh=mesh).execute(
        plan, frames)
    for nid, frame in single.outputs.items():
        np.testing.assert_array_equal(
            np.asarray(frame.data), np.asarray(sharded.outputs[nid].data))


# ---------------------------------------------------------------------------
# multi-host helpers (single-process behavior on the virtual mesh)
# ---------------------------------------------------------------------------

def test_init_multihost_noop_single_process():
    from herdsman_tpu.mesh import init_multihost
    # no args, no env vars -> single-process no-op
    assert init_multihost() is False


def test_make_pod_mesh_shapes(toy_keys):
    from herdsman_tpu.mesh import make_pod_mesh
    mesh = make_pod_mesh(limb=2)
    assert mesh.axis_names == ("batch", "limb")
    assert mesh.devices.shape == (4, 2)
    full = make_pod_mesh(limb=1)
    assert full.devices.shape == (8, 1)
    with pytest.raises(AssertionError):
        make_pod_mesh(limb=3)  # 8 devices not divisible


def test_pod_mesh_runs_sharded_bootstrap(toy_keys):
    """make_pod_mesh output is a drop-in Mesh for the sharded gate step."""
    from herdsman_tpu.mesh import make_pod_mesh
    ck, sk, rng = toy_keys
    mesh = make_pod_mesh(limb=2)
    dsk = device_server_key(sk, layouts=("bsk_conv",))
    dsk_sharded = shard_server_key(dsk, mesh)
    B = 8
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    single = np.asarray(bs.bootstrap_bool_batch(dsk, ct, engine="conv_i8"))
    sharded = np.asarray(
        bootstrap_bool_sharded(dsk_sharded, mesh, ct, engine="conv_i8")
    )
    assert (single == sharded).all()


# ---------------------------------------------------------------------------
# sharded PBS tier (shortint/radix multi-chip path)
# ---------------------------------------------------------------------------

def test_sharded_pbs_bit_identical(pbs_keys):
    """DP-sharded programmable bootstrap == single-device pbs_batch, array-
    equal, including a batch NOT divisible by the device count (pad+slice)."""
    from herdsman_tpu.core import TEST_PBS
    from herdsman_tpu.mesh import pbs_batch_sharded
    from herdsman_tpu.ops import pbs

    ck, sk, rng = pbs_keys
    mesh = make_mesh(batch=8, limb=1)
    dsk = device_server_key(sk, layouts=("bsk_conv",))
    space_bits = 4
    table = [(3 * m + 1) % 16 for m in range(16)]
    B = 5  # not divisible by 8
    msgs = rng.integers(0, 4, B)
    ct = jnp.asarray(
        ref.lwe_encrypt_raw(ck, pbs.encode(TEST_PBS, msgs, space_bits), rng))
    single = np.asarray(
        pbs.pbs_batch(dsk, ct, table, space_bits, engine="conv_i8"))
    sharded = np.asarray(pbs_batch_sharded(
        dsk, mesh, ct, table, space_bits, engine="conv_i8"))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_pbs_many_lut_bit_identical(pbs_keys):
    """Many-LUT (k LUTs, one rotation) sharded == single-device, per LUT."""
    import dataclasses as dc

    from herdsman_tpu.core import TEST_PBS
    from herdsman_tpu.mesh import pbs_many_batch_sharded
    from herdsman_tpu.ops import pbs

    ck0, sk0, rng = pbs_keys
    # many-LUT needs N big enough for k interleaved windows
    p = dc.replace(TEST_PBS, name="test_pbs_many_mesh", N=1024)
    rng2 = np.random.default_rng(777)
    ck, sk = ref.keygen(p, rng2)
    mesh = make_mesh(batch=8, limb=1)
    dsk = device_server_key(sk, layouts=("bsk_conv",))
    space_bits = 4
    tables = ([(m * m) % 16 for m in range(16)],
              [(m + 7) % 16 for m in range(16)])
    B = 6
    msgs = rng2.integers(0, 4, B)
    ct = jnp.asarray(
        ref.lwe_encrypt_raw(ck, pbs.encode(p, msgs, space_bits), rng2))
    single = pbs.pbs_many_batch(dsk, ct, tables, space_bits, engine="conv_i8")
    sharded = pbs_many_batch_sharded(dsk, mesh, ct, tables, space_bits,
                                     engine="conv_i8")
    for s1, s2 in zip(single, sharded):
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))


def test_radix_multiply_on_mesh_bit_identical(pbs_keys):
    """An 8-device radix multiply is bit-identical to single-device: the
    whole integer front end rides ShortContext(mesh=...) (VERDICT round-1
    item 1b)."""
    from herdsman_tpu.core import TEST_PBS
    from herdsman_tpu.radix import RadixContext
    from herdsman_tpu.shortint import ShortContext

    ck, sk, rng = pbs_keys
    mesh = make_mesh(batch=8, limb=1)
    a_vals, b_vals = [13, 42, 7], [11, 3, 29]

    def run(mesh_arg):
        short = ShortContext(TEST_PBS, msg_bits=2, carry_bits=2,
                             keys=(ck, sk), mesh=mesh_arg)
        rctx = RadixContext(short, n_blocks=3)
        # identical ciphertexts across runs: fresh deterministic rng
        short._rng = np.random.default_rng(20240817)
        a = rctx.encrypt(a_vals)
        b = rctx.encrypt(b_vals)
        prod = a * b
        return rctx, prod

    rctx1, prod1 = run(None)
    rctx2, prod2 = run(mesh)
    assert rctx1.decrypt(prod1) == [(x * y) % 64
                                    for x, y in zip(a_vals, b_vals)]
    assert len(prod1.blocks) == len(prod2.blocks)
    for b1, b2 in zip(prod1.blocks, prod2.blocks):
        np.testing.assert_array_equal(np.asarray(b2.data),
                                      np.asarray(b1.data))
