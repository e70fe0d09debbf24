"""Exact-integer NumPy reference implementation of TFHE gate bootstrapping.

This is the bit-exactness anchor for the whole stack: every device kernel in
``herdsman_tpu.ops`` must reproduce these functions exactly (all operations are
integer arithmetic mod 2^32 — there is no floating point on the ciphertext
path, so "bit-exact" is well-defined and testable with array equality).

It also serves as the *client-side* implementation (key generation, encryption
and decryption happen on the host in the HERD model: the reference coordinator
only ever stores and routes ciphertexts, see SURVEY.md §2; clients encrypt with
the sibling `herd` library which is not vendored, reference .gitmodules and
SURVEY.md §2.5).

The gate-evaluation semantics replace the reference's worker contract
`Worker::{map,reduce}` (reference src/execution/worker/grpc/grpc_worker_group.cpp:85-94)
whose workers evaluate boolean circuits with OpenFHE binfhe
(reference CMakeLists.txt:210-211).

All arrays are ``np.uint32`` unless stated otherwise; Python-int scalars are
cast before combining so numpy wraparound semantics stay exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from herdsman_tpu.core.params import TFHEParams

U32 = np.uint32
I64 = np.int64


# ---------------------------------------------------------------------------
# Polynomial arithmetic over R_q = Z_{2^32}[X] / (X^N + 1)
# ---------------------------------------------------------------------------

def negacyclic_polymul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Negacyclic product of two degree-<N polynomials, coefficients mod 2^32.

    Exact integer implementation via 16-bit operand splitting and int64
    convolutions (np.convolve): with a = a1*2^16 + a0, the a1*b1 term
    contributes a multiple of 2^32 (= 0 mod q), and each remaining
    convolution's terms are < 2^32 summed over <= N < 2^10, so all partial
    sums fit int64 exactly.  Supports leading batch dims (broadcast).
    """
    a = np.asarray(a, dtype=U32)
    b = np.asarray(b, dtype=U32)
    N = a.shape[-1]
    assert b.shape[-1] == N
    out_shape = np.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (N,)
    a = np.broadcast_to(a, out_shape).reshape(-1, N)
    b = np.broadcast_to(b, out_shape).reshape(-1, N)
    a0 = (a & U32(0xFFFF)).astype(I64)
    a1 = (a >> U32(16)).astype(I64)
    b0 = (b & U32(0xFFFF)).astype(I64)
    b1 = (b >> U32(16)).astype(I64)
    res = np.empty_like(a)
    for row in range(a.shape[0]):
        lo = np.convolve(a0[row], b0[row])
        mid = np.convolve(a0[row], b1[row]) + np.convolve(a1[row], b0[row])
        full = (lo + (mid << 16)) & 0xFFFFFFFF  # [2N-1] int64, values mod q
        c = full[:N].copy()
        c[: N - 1] -= full[N:]  # negacyclic fold: X^N = -1
        res[row] = (c & 0xFFFFFFFF).astype(U32)
    return res.reshape(out_shape)


def negacyclic_monomial_mul(p: np.ndarray, r: np.ndarray) -> np.ndarray:
    """X^r * p in R_q, r in [0, 2N). Batched: p [..., N], r [...] (broadcast).

    X^N = -1, so rotation by r >= N negates the wrapped-around part twice.
    """
    p = np.asarray(p, dtype=U32)
    r = np.asarray(r)
    N = p.shape[-1]
    out_shape = np.broadcast_shapes(p.shape[:-1], r.shape) + (N,)
    p = np.broadcast_to(p, out_shape).reshape(-1, N)
    r = np.broadcast_to(r, out_shape[:-1]).reshape(-1)
    res = np.empty_like(p)
    for row in range(p.shape[0]):
        rr = int(r[row]) % (2 * N)
        sign_flip = rr >= N
        s = rr % N
        rolled = np.roll(p[row], s)
        if s:
            rolled[:s] = U32(0) - rolled[:s]  # wrapped coeffs pick up X^N = -1
        if sign_flip:
            rolled = U32(0) - rolled
        res[row] = rolled
    return res.reshape(out_shape)


# ---------------------------------------------------------------------------
# Gadget decomposition
# ---------------------------------------------------------------------------

def signed_decompose(x: np.ndarray, bg_bits: int, levels: int) -> np.ndarray:
    """Balanced signed base-2^bg_bits decomposition (closed form, carry-free).

    Returns int32 digits with shape x.shape + (levels,), level 0 is the most
    significant (scale q / Bg).  digit in [-Bg/2, Bg/2).  Reconstruction:
    sum_i d_i * q / Bg^(i+1) == round(x / q * Bg^levels) * q / Bg^levels
    (mod q).

    Closed form: round to the top W = bg_bits*levels bits, add the balanced
    offset sum_i (Bg/2) Bg^i, then read unsigned digits and subtract Bg/2.
    The offset overflow past W bits contributes a multiple of q, i.e. 0.
    """
    x = np.asarray(x, dtype=U32)
    W = bg_bits * levels
    Bg = 1 << bg_bits
    half = Bg >> 1
    if W < 32:  # round-to-nearest at the W-bit cut
        v = (x + U32(1 << (32 - W - 1))) >> U32(32 - W)
    else:
        v = x
    offset = sum(half << (bg_bits * i) for i in range(levels))
    w = v + U32(offset)
    shifts = np.array(
        [bg_bits * (levels - 1 - j) for j in range(levels)], dtype=U32
    )
    digits = (w[..., None] >> shifts) & U32(Bg - 1)
    return digits.astype(np.int32) - np.int32(half)


def unsigned_decompose(x: np.ndarray, base_bits: int, levels: int) -> np.ndarray:
    """Unsigned base-2^base_bits decomposition with rounding (for key switch).

    Returns int32 digits in [0, base), shape x.shape + (levels,), level 0 most
    significant (scale q / base).
    """
    x = np.asarray(x, dtype=U32)
    W = base_bits * levels
    if W < 32:
        v = (x + U32(1 << (32 - W - 1))) >> U32(32 - W)
    else:
        v = x
    shifts = np.array(
        [base_bits * (levels - 1 - j) for j in range(levels)], dtype=U32
    )
    digits = (v[..., None] >> shifts) & U32((1 << base_bits) - 1)
    return digits.astype(np.int32)


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ClientKey:
    params: TFHEParams
    lwe_key: np.ndarray    # [n] uint32 in {0,1}
    glwe_key: np.ndarray   # [k, N] uint32 in {0,1}

    @property
    def extracted_key(self) -> np.ndarray:
        """The kN-dim LWE key implied by sample extraction (coeff order)."""
        return self.glwe_key.reshape(-1)


@dataclasses.dataclass
class ServerKey:
    """Evaluation key material (what the reference stores per session via its
    KeyService, reference src/service/key_service.cpp:19-44)."""

    params: TFHEParams
    bsk: np.ndarray        # [n, (k+1)*l, k+1, N] uint32 — GGSW(s_lwe[i])
    ksk: np.ndarray        # [kN, ks_levels, n+1] uint32 — LWE_n(s_ext[j] q/b^(t+1))


def _gaussian_u32(rng: np.random.Generator, std: float, shape) -> np.ndarray:
    """Centered rounded-Gaussian noise as uint32 (two's complement wrap)."""
    e = np.rint(rng.normal(0.0, std, size=shape)).astype(I64)
    return (e & 0xFFFFFFFF).astype(U32)


def keygen(params: TFHEParams, rng: np.random.Generator) -> tuple[ClientKey, ServerKey]:
    p = params
    lwe_key = rng.integers(0, 2, size=p.n, dtype=np.uint32)
    glwe_key = rng.integers(0, 2, size=(p.k, p.N), dtype=np.uint32)
    ck = ClientKey(p, lwe_key, glwe_key)

    # Bootstrapping key: GGSW(s_lwe[i]) under glwe_key
    bsk = np.empty((p.n, (p.k + 1) * p.levels, p.k + 1, p.N), dtype=U32)
    for i in range(p.n):
        bsk[i] = ggsw_encrypt(ck, int(lwe_key[i]), rng)

    # Key-switching key: LWE_n(s_ext[j] * q / base^(t+1))
    s_ext = ck.extracted_key.astype(I64)
    ksk = np.empty((p.kN, p.ks_levels, p.n + 1), dtype=U32)
    for t in range(p.ks_levels):
        scale = I64(1) << I64(32 - p.ks_base_bits * (t + 1))
        msgs = ((s_ext * scale) & 0xFFFFFFFF).astype(U32)  # [kN]
        ksk[:, t, :] = lwe_encrypt_raw(ck, msgs, rng)
    return ck, ServerKey(p, bsk, ksk)


@dataclasses.dataclass
class PublicKey:
    """LWE public encryption key: M encryptions of zero under the n-LWE
    key.  Anyone holding it can encrypt (random binary subset-sum +
    message + fresh noise) without the secret key — the Regev09 LWE->PKE
    transform.  NOTE on the parameterization: statistical hiding via the
    leftover hash lemma would need M >= (n+1)*log2(q) + 2*lambda (~25k
    rows at n=768, q=2^32); the default M = 2(n+1) instead rests on the
    COMPUTATIONAL hardness of the resulting knapsack-LWE instance (the
    common practical choice, cf. tfhe-rs CompactPublicKey which similarly
    relies on computational assumptions); pass m_rows explicitly for a
    statistically-hiding key."""
    params: TFHEParams
    rows: np.ndarray   # [M, n+1] u32, each an encryption of 0


def make_public_key(ck: ClientKey, rng: np.random.Generator,
                    m_rows: int | None = None) -> PublicKey:
    p = ck.params
    M = m_rows if m_rows is not None else 2 * (p.n + 1)
    zeros = np.zeros(M, dtype=U32)
    return PublicKey(p, lwe_encrypt_raw(ck, zeros, rng))


def lwe_encrypt_pk(pk: PublicKey, mu: np.ndarray,
                   rng: np.random.Generator) -> np.ndarray:
    """Public-key encryption of torus values mu [...]: ct [..., n+1]."""
    p = pk.params
    mu = np.asarray(mu, dtype=U32)
    M = pk.rows.shape[0]
    sel = rng.integers(0, 2, size=mu.shape + (M,), dtype=np.uint32)
    ct = np.einsum("...m,md->...d", sel.astype(np.uint64),
                   pk.rows.astype(np.uint64)).astype(U32)
    ct[..., p.n] = ct[..., p.n] + mu + _gaussian_u32(rng, p.lwe_std,
                                                     mu.shape)
    return ct


def encrypt_bool_pk(pk: PublicKey, bits: np.ndarray,
                    rng: np.random.Generator) -> np.ndarray:
    bits = np.asarray(bits)
    mu = np.where(bits, BOOL_MU, NEG_BOOL_MU).astype(U32)
    return lwe_encrypt_pk(pk, mu, rng)


@dataclasses.dataclass
class CompressedServerKey:
    """Seeded server key (tfhe-rs CompressedServerKey analog): every GLWE /
    LWE mask in the BSK and KSK comes from a public Philox stream, so only
    the BODY polynomials travel — (k+1)x less for the BSK, (n+1)x for the
    KSK (43 MB -> 9.5 MB at STD128_K2).  `expand_server_key` re-derives the
    exact ServerKey."""
    params: TFHEParams
    seed: int
    bsk_bodies: np.ndarray   # [n, (k+1)*levels, N] u32
    ksk_bodies: np.ndarray   # [ks_levels, kN] u32


def _key_mask_stream(p: TFHEParams, seed: int):
    """Deterministic mask draws for a seeded server key, from the raw
    Philox stream (version-stable — see `_philox_u32`).  Draw order is
    part of the format: all BSK GLWE masks first (i-major, row-minor),
    then all KSK LWE masks (level-major, kN-minor)."""
    R = (p.k + 1) * p.levels
    n_bsk = p.n * R * p.k * p.N
    n_ksk = p.ks_levels * p.kN * p.n
    stream = _philox_u32(seed, n_bsk + n_ksk)
    bsk_a = stream[:n_bsk].reshape(p.n, R, p.k, p.N)
    ksk_a = stream[n_bsk:].reshape(p.ks_levels, p.kN, p.n)
    return bsk_a, ksk_a


def _ggsw_row_msg(ck: ClientKey, m: int, j: int, lev: int) -> np.ndarray:
    """Message polynomial of GGSW row (j, lev) — same as ggsw_encrypt."""
    p = ck.params
    scale = I64(1) << I64(32 - p.bg_bits * (lev + 1))
    factor = (I64(m) * scale) & 0xFFFFFFFF
    if j < p.k:
        return ((I64(0) - I64(factor))
                * ck.glwe_key[j].astype(I64) & 0xFFFFFFFF).astype(U32)
    msg = np.zeros(p.N, dtype=U32)
    msg[0] = U32(factor)
    return msg


def keygen_seeded(
    params: TFHEParams, rng: np.random.Generator, seed: int,
) -> tuple[ClientKey, CompressedServerKey]:
    """Like `keygen` but with all evaluation-key masks drawn from the
    public `seed` stream — the noise (and the secret keys) still come from
    the private `rng`."""
    p = params
    lwe_key = rng.integers(0, 2, size=p.n, dtype=np.uint32)
    glwe_key = rng.integers(0, 2, size=(p.k, p.N), dtype=np.uint32)
    ck = ClientKey(p, lwe_key, glwe_key)
    bsk_a, ksk_a = _key_mask_stream(p, seed)

    R = (p.k + 1) * p.levels
    bsk_bodies = np.empty((p.n, R, p.N), dtype=U32)
    for i in range(p.n):
        for j in range(p.k + 1):
            for lev in range(p.levels):
                row = j * p.levels + lev
                msg = _ggsw_row_msg(ck, int(lwe_key[i]), j, lev)
                b = msg + _gaussian_u32(rng, p.glwe_std, (p.N,))
                for jj in range(p.k):
                    b = b + negacyclic_polymul(bsk_a[i, row, jj],
                                               glwe_key[jj])
                bsk_bodies[i, row] = b

    s_ext = ck.extracted_key.astype(I64)
    ksk_bodies = np.empty((p.ks_levels, p.kN), dtype=U32)
    for t in range(p.ks_levels):
        scale = I64(1) << I64(32 - p.ks_base_bits * (t + 1))
        msgs = ((s_ext * scale) & 0xFFFFFFFF).astype(U32)
        e = _gaussian_u32(rng, p.lwe_std, (p.kN,))
        ksk_bodies[t] = (
            (ksk_a[t].astype(np.uint64) * lwe_key[None, :]).sum(
                axis=-1).astype(U32) + msgs + e
        )
    return ck, CompressedServerKey(p, seed, bsk_bodies, ksk_bodies)


def expand_server_key(csk: CompressedServerKey) -> ServerKey:
    """(seed, bodies) -> the full ServerKey, masks re-derived."""
    p = csk.params
    R = (p.k + 1) * p.levels
    bsk_a, ksk_a = _key_mask_stream(p, csk.seed)
    bsk = np.concatenate(
        [bsk_a, csk.bsk_bodies[:, :, None, :]], axis=2
    )  # [n, R, k+1, N]
    ksk = np.concatenate(
        [ksk_a, csk.ksk_bodies[:, :, None]], axis=-1
    )  # [ks_levels, kN, n+1]
    return ServerKey(p, bsk, np.swapaxes(ksk, 0, 1).copy())


@dataclasses.dataclass
class PackingKey:
    """LWE -> GLWE packing keyswitch key: for every n-LWE key bit s_j,
    GLWE encryptions of the constant polynomial s_j * q/base^(t+1).  Packs
    up to N LWE ciphertexts into ONE GLWE ciphertext — the download-side
    compression dual of the seeded upload ((n+1)*N u32 -> (k+1)*N u32,
    ~192x at STD128_K2).  Reuses the (ks_base_bits, ks_levels) gadget."""
    params: TFHEParams
    pksk: np.ndarray   # [n, ks_levels, k+1, N] u32


def make_packing_key(ck: ClientKey,
                     rng: np.random.Generator) -> PackingKey:
    p = ck.params
    pksk = np.empty((p.n, p.ks_levels, p.k + 1, p.N), dtype=U32)
    for j in range(p.n):
        for t in range(p.ks_levels):
            scale = I64(1) << I64(32 - p.ks_base_bits * (t + 1))
            msg = np.zeros(p.N, dtype=U32)
            msg[0] = U32((I64(ck.lwe_key[j]) * scale) & 0xFFFFFFFF)
            pksk[j, t] = glwe_encrypt(ck, msg, rng)
    return PackingKey(p, pksk)


def pack_lwes(pk: PackingKey, cts: np.ndarray) -> np.ndarray:
    """Pack M <= N LWE cts [M, n+1] into one GLWE [k+1, N] whose message
    polynomial holds m_i at coefficient i (functional keyswitch):

        out = (0, sum_i b_i X^i) - sum_{j,t} D_{j,t}(X) (*) PKSK[j,t]

    with D_{j,t} the t-th unsigned gadget digit of the mask polynomial
    A_j(X) = sum_i a_i[j] X^i, taken coefficient-wise.  phase(out) =
    sum_i (m_i + e_i) X^i + keyswitch noise."""
    p = pk.params
    cts = np.asarray(cts, dtype=U32)
    M = cts.shape[0]
    assert M <= p.N, "at most N ciphertexts per packed GLWE"
    a = np.zeros((p.n, p.N), dtype=U32)   # A_j coefficients
    a[:, :M] = cts[:, : p.n].T
    out = np.zeros((p.k + 1, p.N), dtype=U32)
    out[p.k, :M] = cts[:, p.n]
    digits = unsigned_decompose(a, p.ks_base_bits, p.ks_levels)  # [n, N, t]
    for j in range(p.n):
        for t in range(p.ks_levels):
            d = digits[j, :, t].astype(U32)
            if not d.any():
                continue
            out = out - negacyclic_polymul(d[None, :], pk.pksk[j, t])
    return out


def unpack_bools(ck: ClientKey, glwe: np.ndarray, count: int) -> np.ndarray:
    """Decrypt a packed GLWE of boolean +-q/8 messages -> [count] bool."""
    ph = glwe_phase(ck, np.asarray(glwe, dtype=U32))[:count]
    return ph.astype(np.int32) > 0


# ---------------------------------------------------------------------------
# LWE
# ---------------------------------------------------------------------------

def lwe_encrypt_raw(
    ck: ClientKey, mu: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Encrypt torus values mu [..."] -> ct [..., n+1] under the n-LWE key."""
    p = ck.params
    mu = np.asarray(mu, dtype=U32)
    a = rng.integers(0, 1 << 32, size=mu.shape + (p.n,), dtype=np.uint64).astype(U32)
    e = _gaussian_u32(rng, p.lwe_std, mu.shape)
    b = (a * ck.lwe_key).sum(axis=-1, dtype=U32) + mu + e
    return np.concatenate([a, b[..., None]], axis=-1)


def _philox_u32(seed: int, n_u32: int, skip_u32: int = 0) -> np.ndarray:
    """Deterministic uniform u32 stream from the RAW Philox counter output.

    Format note: Generator.integers() output is NOT covered by NumPy's
    cross-version stability guarantee — only the bit generator's raw
    stream is — so anything that becomes a wire/disk format must derive
    from random_raw.  Each raw u64 word yields two u32 (low half first);
    Philox.advance(d) skips exactly 4*d words, giving O(1) offsets.
    """
    assert n_u32 % 2 == 0 and skip_u32 % 2 == 0, "u32 stream moves in pairs"
    skip_w, n_w = skip_u32 // 2, n_u32 // 2
    bg = np.random.Philox(key=seed & ((1 << 64) - 1))
    bg.advance(skip_w // 4)
    rem = skip_w % 4
    raw = bg.random_raw(rem + n_w)[rem:]
    out = np.empty(2 * n_w, dtype=U32)
    out[0::2] = (raw & 0xFFFFFFFF).astype(U32)
    out[1::2] = (raw >> 32).astype(U32)
    return out


def seeded_mask(params: TFHEParams, seed: int, count: int,
                offset: int = 0) -> np.ndarray:
    """Deterministic uniform LWE masks [count, n] u32 from a public seed.

    Derived from the raw Philox counter stream (version-stable; see
    `_philox_u32`), so the client publishes (seed, bodies) and any party
    re-derives the masks — the standard seeded-LWE compression: a row
    shrinks from (n+1) u32 to ONE u32 (770x at n = 768).  `offset` skips
    the first `offset` rows of the stream in O(1) (per-chunk expansion of
    a streamed upload).
    """
    return _philox_u32(seed, count * params.n,
                       skip_u32=offset * params.n).reshape(count, params.n)


def lwe_encrypt_seeded(
    ck: ClientKey, mu: np.ndarray, seed: int, rng: np.random.Generator,
    offset: int = 0,
) -> np.ndarray:
    """Seeded encryption: returns ONLY the bodies [count] u32; the masks
    are re-derivable from (seed, row index) via `seeded_mask`.  The noise
    still comes from the client's private rng — only the mask is public
    pseudorandomness (standard seeded-LWE).

    SECURITY: a (key, seed) pair must be used for at most ONE mask stream.
    Reusing a seed reuses the masks, and ct1 - ct2 = (mu1 - mu2) + (e1 - e2)
    leaks plaintext relations outright.  Callers that don't manage seeds
    themselves should use core.client.encrypt_rows_seeded, which draws a
    fresh CSPRNG seed per call."""
    p = ck.params
    mu = np.asarray(mu, dtype=U32).reshape(-1)
    a = seeded_mask(p, seed, mu.shape[0], offset)
    e = _gaussian_u32(rng, p.lwe_std, mu.shape)
    return (a * ck.lwe_key).sum(axis=-1, dtype=U32) + mu + e


def expand_seeded(params: TFHEParams, seed: int, bodies: np.ndarray,
                  offset: int = 0) -> np.ndarray:
    """(seed, bodies [count]) -> full LWE ciphertexts [count, n+1] u32."""
    bodies = np.asarray(bodies, dtype=U32).reshape(-1)
    a = seeded_mask(params, seed, bodies.shape[0], offset)
    return np.concatenate([a, bodies[:, None]], axis=-1)


def encrypt_bool_seeded(ck: ClientKey, bits: np.ndarray, seed: int,
                        rng: np.random.Generator,
                        offset: int = 0) -> np.ndarray:
    bits = np.asarray(bits).reshape(-1)
    mu = np.where(bits, BOOL_MU, NEG_BOOL_MU).astype(U32)
    return lwe_encrypt_seeded(ck, mu, seed, rng, offset)


def lwe_phase(key: np.ndarray, ct: np.ndarray) -> np.ndarray:
    """b - <a, s> mod 2^32 for ct [..., dim+1] under binary key [dim]."""
    a = ct[..., :-1]
    b = ct[..., -1]
    return b - (a * key).sum(axis=-1, dtype=U32)


def lwe_decrypt_bool(ck: ClientKey, ct: np.ndarray) -> np.ndarray:
    """Decode the boolean +-q/8 encoding: True iff phase in (0, q/2)."""
    ph = lwe_phase(ck.lwe_key, ct)
    return ph.astype(np.int32) > 0


BOOL_MU = U32(1 << 29)            # q/8
NEG_BOOL_MU = U32((1 << 32) - (1 << 29))  # -q/8 mod 2^32


def encrypt_bool(
    ck: ClientKey, bits: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    bits = np.asarray(bits)
    mu = np.where(bits, BOOL_MU, NEG_BOOL_MU).astype(U32)
    return lwe_encrypt_raw(ck, mu, rng)


# ---------------------------------------------------------------------------
# GLWE / GGSW
# ---------------------------------------------------------------------------

def glwe_encrypt(
    ck: ClientKey, msg_poly: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """GLWE ct [k+1, N] of message polynomial [N] (already torus-scaled)."""
    p = ck.params
    a = rng.integers(0, 1 << 32, size=(p.k, p.N), dtype=np.uint64).astype(U32)
    e = _gaussian_u32(rng, p.glwe_std, (p.N,))
    b = np.asarray(msg_poly, dtype=U32) + e
    for j in range(p.k):
        b = b + negacyclic_polymul(a[j], ck.glwe_key[j])
    return np.concatenate([a, b[None, :]], axis=0)


def glwe_phase(ck: ClientKey, ct: np.ndarray) -> np.ndarray:
    p = ck.params
    b = ct[..., p.k, :].copy()
    for j in range(p.k):
        b = b - negacyclic_polymul(ct[..., j, :], ck.glwe_key[j])
    return b


def ggsw_encrypt(ck: ClientKey, m: int, rng: np.random.Generator) -> np.ndarray:
    """GGSW ct [(k+1)*l, k+1, N] of small integer m (typically a key bit)."""
    p = ck.params
    rows = []
    for j in range(p.k + 1):
        for lev in range(p.levels):
            scale = I64(1) << I64(32 - p.bg_bits * (lev + 1))
            factor = (I64(m) * scale) & 0xFFFFFFFF
            msg = np.zeros(p.N, dtype=U32)
            if j < p.k:
                # encrypts -s_j * m * q/Bg^(lev+1)
                msg = (
                    (I64(0) - I64(factor)) * ck.glwe_key[j].astype(I64)
                ) & 0xFFFFFFFF
                msg = msg.astype(U32)
            else:
                msg[0] = U32(factor)
            rows.append(glwe_encrypt(ck, msg, rng))
    return np.stack(rows, axis=0)


def external_product(
    params: TFHEParams, ggsw: np.ndarray, glwe: np.ndarray
) -> np.ndarray:
    """GGSW boxdot GLWE -> GLWE (approximately m * glwe). Exact integer ops."""
    p = params
    # Decompose all k+1 polys: [k+1, N, levels] -> rows [(k+1)*l, N]
    digits = signed_decompose(glwe, p.bg_bits, p.levels)  # [k+1, N, l] int32
    digits = np.moveaxis(digits, -1, 1).reshape((p.k + 1) * p.levels, p.N)
    digits_u = digits.astype(U32)  # two's complement view, exact mod q
    out = np.zeros((p.k + 1, p.N), dtype=U32)
    for row in range((p.k + 1) * p.levels):
        for col in range(p.k + 1):
            out[col] += negacyclic_polymul(digits_u[row], ggsw[row, col])
    return out


def cmux(
    params: TFHEParams, ggsw_bit: np.ndarray, c0: np.ndarray, c1: np.ndarray
) -> np.ndarray:
    """Select c1 if the GGSW-encrypted bit is 1 else c0."""
    return c0 + external_product(params, ggsw_bit, c1 - c0)


# ---------------------------------------------------------------------------
# Bootstrapping pipeline
# ---------------------------------------------------------------------------

def mod_switch_2N(params: TFHEParams, ct: np.ndarray) -> np.ndarray:
    """Round LWE coefficients from q = 2^32 down to 2N (returns int64 in [0,2N))."""
    shift = 32 - (params.log2_2N + 1)  # keep one extra bit for rounding
    r = (ct >> U32(shift)).astype(I64)
    return (r + 1) >> 1 & I64(params.two_N - 1)


def make_test_poly(params: TFHEParams, mu: int = int(BOOL_MU)) -> np.ndarray:
    """Constant test polynomial: all coefficients mu -> sign bootstrap."""
    return np.full(params.N, U32(mu), dtype=U32)


def blind_rotate(
    sk: ServerKey, ct: np.ndarray, test_poly: np.ndarray
) -> np.ndarray:
    """GINX binary blind rotation. ct is a single LWE [n+1]; returns GLWE acc.

    acc starts as the trivial GLWE of X^{-b~} * v and is CMux-stepped by each
    bootstrapping-key bit:  acc += BSK_i  boxdot  (X^{a~_i} * acc - acc).
    """
    p = sk.params
    tilde = mod_switch_2N(p, ct)          # [n+1] in [0, 2N)
    a_t, b_t = tilde[:-1], int(tilde[-1])
    acc = np.zeros((p.k + 1, p.N), dtype=U32)
    acc[p.k] = negacyclic_monomial_mul(test_poly, (2 * p.N - b_t) % (2 * p.N))
    for i in range(p.n):
        rot = negacyclic_monomial_mul(acc, int(a_t[i]))  # X^{a~_i} * acc
        acc = acc + external_product(p, sk.bsk[i], rot - acc)
    return acc


def sample_extract(params: TFHEParams, glwe: np.ndarray,
                   offset: int = 0) -> np.ndarray:
    """Extract coeff `offset` as an LWE ct of dimension kN (+ body): [kN+1].

    Coefficient `offset` of a_j * s_j is sum_i a_j[(offset - i) mod N] *
    s_j[i], with + sign for i <= offset and - beyond (X^N = -1)."""
    p = params
    a_out = np.empty(p.kN, dtype=U32)
    for j in range(p.k):
        aj = glwe[j]
        idx = (offset - np.arange(p.N)) % p.N
        coeffs = aj[idx]
        neg = np.arange(p.N) > offset
        a_out[j * p.N : (j + 1) * p.N] = np.where(
            neg, U32(0) - coeffs, coeffs)
    b_out = glwe[p.k, offset]
    return np.concatenate([a_out, np.array([b_out], dtype=U32)])


def key_switch(sk: ServerKey, ct: np.ndarray) -> np.ndarray:
    """Switch an extracted [kN+1] LWE ct down to the n-LWE key: [n+1].

    BALANCED signed digits (same gadget as the external product): with a
    fixed KSK, the key-switch error is sum_{j,t} d_{j,t} * e_{j,t} over
    ~kN*t fixed noise samples — unsigned digits (E[d] = B/2 - 0.5,
    E[d^2] ~ B^2/3) amplify the KSK noise sample-mean into a systematic
    output bias (~1.3e-3 q measured at STD128_SHORTINT) and triple the
    variance vs balanced digits (E[d] = -0.5, E[d^2] = B^2/12)."""
    p = sk.params
    a, b = ct[:-1], ct[-1]
    digits = signed_decompose(a, p.ks_base_bits, p.ks_levels)  # [kN, t]
    out = np.zeros(p.n + 1, dtype=U32)
    out[p.n] = b
    # out -= sum_{j,t} d_{j,t} * KSK[j,t]  (signed d: wraparound exact)
    contrib = (digits.astype(U32)[..., None] * sk.ksk).sum(
        axis=(0, 1), dtype=U32)
    return out - contrib


def bootstrap_raw(sk: ServerKey, ct: np.ndarray, test_poly: np.ndarray) -> np.ndarray:
    """blind_rotate + sample_extract (no key switch): [n+1] -> [kN+1]."""
    return sample_extract(sk.params, blind_rotate(sk, ct, test_poly))


def bootstrap_bool(sk: ServerKey, ct: np.ndarray) -> np.ndarray:
    """Full sign bootstrap back to the n-LWE key: [n+1] -> [n+1]."""
    return key_switch(sk, bootstrap_raw(sk, ct, make_test_poly(sk.params)))


# ---------------------------------------------------------------------------
# Boolean gate API (classic TFHE gate linear combinations)
# ---------------------------------------------------------------------------

def _const(params: TFHEParams, dim: int, mu: int) -> np.ndarray:
    ct = np.zeros(dim + 1, dtype=U32)
    ct[dim] = U32(mu & 0xFFFFFFFF)
    return ct


def gate_and(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    return bootstrap_bool(sk, c1 + c2 - _const(p, p.n, int(BOOL_MU)))


def gate_or(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    return bootstrap_bool(sk, c1 + c2 + _const(p, p.n, int(BOOL_MU)))


def gate_nand(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    return bootstrap_bool(sk, _const(p, p.n, int(BOOL_MU)) - c1 - c2)


def gate_nor(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    return bootstrap_bool(sk, U32(0) - (c1 + c2 + _const(p, p.n, int(BOOL_MU))))


def gate_xor(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    lin = U32(2) * (c1 + c2) + _const(p, p.n, 1 << 30)  # 2(c1+c2) + q/4
    return bootstrap_bool(sk, lin)


def gate_xnor(sk: ServerKey, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    p = sk.params
    lin = U32(0) - (U32(2) * (c1 + c2) + _const(p, p.n, 1 << 30))
    return bootstrap_bool(sk, lin)


def gate_not(sk: ServerKey, c1: np.ndarray) -> np.ndarray:
    return U32(0) - c1


def gate_mux(
    sk: ServerKey, sel: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """sel ? a : b — two raw bootstraps, one key switch (classic TFHE MUX)."""
    p = sk.params
    tv = make_test_poly(p)
    t1 = bootstrap_raw(sk, sel + a - _const(p, p.n, int(BOOL_MU)), tv)
    t2 = bootstrap_raw(sk, b - sel - _const(p, p.n, int(BOOL_MU)), tv)
    u = t1 + t2 + _const(p, p.kN, int(BOOL_MU))
    return key_switch(sk, u)
