"""Multi-chip sharding — the TPU-native replacement for the reference's
worker-fleet parallelism (round-robin gRPC dispatch, reference
src/execution/worker/grpc/grpc_worker_group.cpp:76-102) and partition
parallelism (SURVEY.md §2.2).

Mesh axes:

- ``batch`` (DP analog): the ciphertext batch is sharded; no communication.
  This is the reference's partition-per-worker parallelism reborn as array
  sharding.
- ``limb`` (TP analog): the external-product contraction rows — the
  (k+1)*levels GGSW rows — are sharded; each device holds 1/limb of the
  bootstrapping key and contributes a partial product, combined with an
  exact-mod-2^32 psum (uint32 wraparound addition is associative, so the
  XLA integer psum is EXACT — no floating-point collective anywhere).

All collectives ride ICI via jax.shard_map + jax.lax.psum.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops import gates as gate_ops
from herdsman_tpu.ops import poly
from herdsman_tpu.ops.decomp import signed_decompose
from herdsman_tpu.ops.server_key import DeviceServerKey

U32 = jnp.uint32


def make_mesh(batch: int, limb: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= batch * limb, (
        f"need {batch * limb} devices, have {len(devices)}"
    )
    dev_array = np.array(devices[: batch * limb]).reshape(batch, limb)
    return Mesh(dev_array, axis_names=("batch", "limb"))


def shard_server_key(dsk: DeviceServerKey, mesh: Mesh) -> DeviceServerKey:
    """Place key material: BSK row-sharded over 'limb', KSK replicated."""
    from jax.sharding import NamedSharding

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    return dataclasses.replace(
        dsk,
        # bsk_* arrays have the GGSW row axis at position 1
        bsk_ext=put(dsk.bsk_ext, P(None, "limb")),
        bsk_conv=put(dsk.bsk_conv, P(None, "limb")),
        bsk_bt=put(dsk.bsk_bt, P(None, "limb")),
        ksk_limbs=put(dsk.ksk_limbs, P()),
        ksk=put(dsk.ksk, P()),
    )


def _local_blind_rotate(dsk: DeviceServerKey, ct: jax.Array,
                        test_poly: jax.Array, bsk_local: jax.Array,
                        engine: str, axis: str) -> jax.Array:
    """shard_map body: ct is the per-device batch shard; bsk_local is the
    per-device row shard of the key; acc stays replicated along `axis`."""
    p = dsk.params
    ep, _ = bs.ENGINES[engine]
    B = ct.shape[0]
    R_local = bsk_local.shape[1]
    R = (p.k + 1) * p.levels
    n_limb = jax.lax.axis_size(axis)
    limb_idx = jax.lax.axis_index(axis)
    row0 = limb_idx * R_local

    tilde = bs.mod_switch_2N(p, ct)
    a_t = tilde[:, : p.n]
    b_t = tilde[:, p.n]
    body = poly.negacyclic_monomial_mul(
        jnp.broadcast_to(test_poly.astype(U32), (B, p.N)),
        (jnp.int32(p.two_N) - b_t) & jnp.int32(p.two_N - 1),
    )
    acc0 = jnp.concatenate(
        [jnp.zeros((B, p.k, p.N), dtype=U32), body[:, None, :]], axis=1
    )

    def step(acc, xs):
        bsk_i, a_i = xs
        rot = poly.negacyclic_monomial_mul(acc, a_i[:, None])
        diff = rot - acc
        digits = signed_decompose(diff, p.bg_bits, p.levels)
        digits = jnp.moveaxis(digits, -1, 2).reshape(B, R, p.N)
        local_digits = jax.lax.dynamic_slice_in_dim(digits, row0, R_local, 1)
        partial = ep(p, local_digits, bsk_i)
        prod = jax.lax.psum(partial, axis) if n_limb > 1 else partial
        return acc + prod, None

    acc, _ = jax.lax.scan(step, acc0, (bsk_local, a_t.T))
    return acc


def bootstrap_bool_sharded(
    dsk: DeviceServerKey, mesh: Mesh, ct: jax.Array,
    engine: str = "conv_i8", unroll: bool = False,
) -> jax.Array:
    """Full sign bootstrap sharded (batch, limb): [B, n+1] -> [B, n+1].

    EP-level engines (`bs.ENGINES`) support both mesh axes. Step/rotation
    engines (pallas_fused, pallas_mega — the fast single-chip kernels)
    shard over `batch` only: each device runs the whole fused kernel on
    its batch shard (pure DP, zero collectives — the reference's
    one-partition-per-worker dispatch as array sharding)."""
    p = dsk.params
    if engine.startswith("pallas"):
        bs._register_pallas_engine(engine)
    if engine not in bs.ENGINES:
        entry = bs.STEP_ENGINES.get(engine) or bs.ROTATION_ENGINES[engine]
        key_layout = entry[1]
        # DP-only is a MEASURED design decision for the mega tier, not a
        # gap: limb-sharding would split the GGSW-row contraction (psum of
        # [Bt, C4P] i32 per rotation step, n per bootstrap) but the serial
        # VPU stream (rotate/decompose/pack, ~40 of mega11's 115 ms/batch
        # at STD128_K2 — docs/BENCH_LOG.md round 2) is NOT divisible: each
        # limb shard still rotates the full replicated accumulator, so at
        # limb=2 per-chip time is >=37.5 (dots/2) + 40 (stream) + psum
        # latency ~= 67% scaling efficiency BEFORE any ICI cost.  Batch
        # sharding divides everything at zero collectives.  EP-tier
        # engines (bs.ENGINES) keep the limb axis for when a single
        # ciphertext must span chips.
        assert dict(zip(mesh.axis_names, mesh.devices.shape)).get(
            "limb", 1) == 1, "step/rotation engines shard over batch only"

        def dp_body(ct_shard, bsk_arr, ksk_limbs):
            local = dataclasses.replace(
                dsk, **{key_layout: bsk_arr}, ksk_limbs=ksk_limbs)
            return bs.bootstrap_bool_batch(local, ct_shard, engine=engine,
                                           unroll=unroll)

        fn = jax.shard_map(
            dp_body, mesh=mesh,
            in_specs=(P("batch"), P(), P()),
            out_specs=P("batch"),
            check_vma=False,
        )
        return fn(ct, getattr(dsk, key_layout), dsk.ksk_limbs)
    _, key_layout = bs.ENGINES[engine]
    bsk = getattr(dsk, key_layout)
    tv = bs.make_test_poly(p)

    def body(ct_shard, bsk_local, ksk_limbs):
        # shard_map bodies must not close over device arrays: rebuild the
        # key container from the shard_map arguments only
        local_dsk = DeviceServerKey(
            params=p, bsk_ext=None, bsk_conv=None, bsk_bt=None,
            ksk_limbs=ksk_limbs, ksk=None,
        )
        acc = _local_blind_rotate(
            local_dsk, ct_shard, tv, bsk_local, engine, "limb"
        )
        raw = bs.sample_extract_batch(p, acc)
        return bs.key_switch_batch(local_dsk, raw)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("batch"), P(None, "limb"), P()),
        out_specs=P("batch"),
        check_vma=False,
    )
    return fn(ct, bsk, dsk.ksk_limbs)


def _engine_key_layout(engine: str) -> str:
    """BSK layout field a given engine consumes (registry lookup across
    the three engine tiers)."""
    if engine.startswith("pallas"):
        bs._register_pallas_engine(engine)
    for reg in (bs.STEP_ENGINES, bs.ROTATION_ENGINES, bs.ENGINES):
        if engine in reg:
            return reg[engine][1]
    raise KeyError(f"unknown engine {engine!r}")


@functools.lru_cache(maxsize=None)
def _pbs_exec_sharded(mesh: Mesh, engine: str, k: int, key_layout: str,
                      params, unroll: bool):
    """Jitted DP-sharded whole-PBS pipeline for k interleaved LUTs: the
    ciphertext batch shards over ALL mesh devices (pure data parallelism —
    the reference's one-partition-per-worker dispatch), keys and the test
    polynomial replicate; zero collectives.  Cached per (mesh, engine, k)
    like ops.pbs._pbs_exec so LUT-table changes never retrace."""
    p = params
    coarse = k.bit_length() - 1
    dp = P(tuple(mesh.axis_names))

    def body(ct, bsk_arr, ksk_limbs, tv):
        # shard_map bodies must not close over device arrays: rebuild the
        # key container from the shard_map arguments only
        local = DeviceServerKey(
            params=p, bsk_ext=None, bsk_conv=None, bsk_bt=None,
            ksk_limbs=ksk_limbs, ksk=None,
        )
        local = dataclasses.replace(local, **{key_layout: bsk_arr})
        acc = bs.blind_rotate_batch(local, ct, tv, engine=engine,
                                    coarse_bits=coarse, unroll=unroll)
        raws = jnp.concatenate(
            [bs.sample_extract_batch(p, acc, offset=j) for j in range(k)],
            axis=0,
        )
        ks = bs.key_switch_batch(local, raws)
        return ks.reshape(k, ct.shape[0], ks.shape[-1])

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(dp, P(), P(), P()),
        out_specs=P(None, tuple(mesh.axis_names)),
        check_vma=False,
    )
    return jax.jit(fn)


def pbs_many_batch_sharded(
    dsk: DeviceServerKey, mesh: Mesh, ct: jax.Array, tables,
    msg_bits: int, engine: str = "conv_i8", unroll: bool = False,
) -> list[jax.Array]:
    """k LUTs over the SAME batch with the batch sharded over every mesh
    device: [B, n+1] -> k x [B, n+1], bit-identical to
    ops.pbs.pbs_many_batch (per-row math is untouched; sharding only
    changes placement).  This is the PBS tier's multi-chip path — the
    shortint/radix front ends ride it via ShortContext(mesh=...)."""
    from herdsman_tpu.ops import pbs as pbs_mod

    p = dsk.params
    k = len(tables)
    if k == 1:
        tv = pbs_mod.lut_test_poly(p, tables[0], msg_bits)
    else:
        assert k & (k - 1) == 0, "LUT count must be a power of two"
        tv = pbs_mod.lut_test_poly_many(p, tables, msg_bits)
    key_layout = _engine_key_layout(engine)
    n_dev = int(mesh.devices.size)
    B0 = ct.shape[0]
    pad = (-B0) % n_dev
    if pad:
        ct = jnp.concatenate(
            [ct, jnp.zeros((pad, ct.shape[1]), dtype=ct.dtype)], axis=0
        )
    fn = _pbs_exec_sharded(mesh, engine, k, key_layout, p, unroll)
    out = fn(ct, getattr(dsk, key_layout), dsk.ksk_limbs, tv)
    return [out[j, :B0] for j in range(k)]


def pbs_batch_sharded(
    dsk: DeviceServerKey, mesh: Mesh, ct: jax.Array, table,
    msg_bits: int, engine: str = "conv_i8", unroll: bool = False,
) -> jax.Array:
    """Single-LUT programmable bootstrap, batch sharded over the mesh."""
    return pbs_many_batch_sharded(dsk, mesh, ct, [table], msg_bits,
                                  engine=engine, unroll=unroll)[0]


def gate_step_sharded(
    dsk: DeviceServerKey, mesh: Mesh, gate_ids: jax.Array,
    c1: jax.Array, c2: jax.Array, engine: str = "conv_i8",
    unroll: bool = False,
) -> jax.Array:
    """One full herd step on the mesh: heterogeneous gate linear combine +
    sharded bootstrap — the flagship multi-chip program (the reference's
    `schedule_tasks_on_workers` loop collapsed into one XLA program)."""
    lin = gate_ops.gate_linear(dsk.params.n, gate_ids, c1, c2)
    return bootstrap_bool_sharded(dsk, mesh, lin, engine=engine,
                                  unroll=unroll)
