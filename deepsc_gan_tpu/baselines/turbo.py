"""Rate-1/3 turbo code with an iterative max-log-MAP (BCJR) decoder.

TPU-native counterpart of the reference's MATLAB Turbo stage (artifacts
only: `common/output/SNR=*.mat` decoded bit matrices — SURVEY.md §2.36).
Design, not a port:

- Constituent code: 4-state recursive systematic convolutional (RSC)
  encoder, generators (g0, g1) = (7, 5) octal — feedback 1+D+D², parity
  1+D². Two RSCs over (u, interleave(u)) give systematic + two parity
  streams = rate 1/3.
- Decoder: max-log-MAP BCJR as two `lax.scan`s (forward alpha, backward
  beta) over the block, batched over all blocks at once — the trellis
  recursion is sequential in k but embarrassingly parallel over blocks
  and states, which is exactly the (scan × vmap) shape XLA maps well.
- Extrinsic information exchanged between the two constituent decoders
  for `iters` half-iteration pairs via a fixed pseudo-random interleaver.

Everything is jittable with static shapes; the same code runs on TPU and
on the CPU test backend (tests/test_classical.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 4-state RSC(7,5) trellis tables. State s = s1*2 + s2 for register
# (s1, s2); input bit u: a = u^s1^s2 (feedback 7), parity p = a^s2
# (feedforward 5), next state = (a, s1).
_NS = np.zeros((4, 2), dtype=np.int32)   # next state
_PB = np.zeros((4, 2), dtype=np.int32)   # parity bit
for _s in range(4):
    _s1, _s2 = _s >> 1, _s & 1
    for _u in range(2):
        _a = _u ^ _s1 ^ _s2
        _PB[_s, _u] = _a ^ _s2
        _NS[_s, _u] = (_a << 1) | _s1
# inverse map: for each next-state s', the two (prev_state, input) pairs
_PREV_S = np.zeros((4, 2), dtype=np.int32)
_PREV_U = np.zeros((4, 2), dtype=np.int32)
_cnt = [0, 0, 0, 0]
for _s in range(4):
    for _u in range(2):
        _ns = _NS[_s, _u]
        _PREV_S[_ns, _cnt[_ns]] = _s
        _PREV_U[_ns, _cnt[_ns]] = _u
        _cnt[_ns] += 1
assert _cnt == [2, 2, 2, 2]

_NEG = -1e9


def rsc_encode(u: np.ndarray) -> np.ndarray:
    """Parity stream of the RSC(7,5) encoder. u: (..., K) bits -> (..., K).

    NumPy reference implementation (host side, used at encode time and by
    the tests; the hot path is the decoder).
    """
    u = np.asarray(u, dtype=np.int64)
    out = np.zeros_like(u)
    s1 = np.zeros(u.shape[:-1], dtype=np.int64)
    s2 = np.zeros_like(s1)
    for k in range(u.shape[-1]):
        a = u[..., k] ^ s1 ^ s2
        out[..., k] = a ^ s2
        s1, s2 = a, s1
    return out.astype(np.uint8)


@jax.jit
def _bcjr(l_sys: jnp.ndarray, l_par: jnp.ndarray, l_apr: jnp.ndarray
          ) -> jnp.ndarray:
    """Max-log-MAP BCJR over the 4-state trellis.

    All inputs (B, K) LLRs (positive = bit 0 / BPSK +1 more likely).
    Returns the full a-posteriori LLR for the systematic bits, (B, K).
    Unterminated trellis: alpha_0 = state 0, beta_K uniform.
    """
    ns = jnp.asarray(_NS)          # (4,2)
    prev_s = jnp.asarray(_PREV_S)  # (4,2)
    prev_u = jnp.asarray(_PREV_U)  # (4,2)
    x_u = 1.0 - 2.0 * jnp.arange(2.0)                  # (2,)
    x_p = 1.0 - 2.0 * jnp.asarray(_PB, jnp.float32)    # (4,2)

    B, K = l_sys.shape

    def gamma(ls_k, lp_k, la_k):
        # (B, 4 states, 2 inputs)
        g = 0.5 * (la_k + ls_k)[:, None, None] * x_u[None, None, :]
        return g + 0.5 * lp_k[:, None, None] * x_p[None, :, :]

    def fwd(alpha, inputs):
        ls_k, lp_k, la_k = inputs
        g = gamma(ls_k, lp_k, la_k)                       # (B,4,2)
        # alpha'(b, s') = max_i alpha[b, prev_s[s',i]]
        #                       + g[b, prev_s[s',i], prev_u[s',i]]
        cand = alpha[:, prev_s] + g[:, prev_s, prev_u]
        new = cand.max(-1)
        new = new - new.max(-1, keepdims=True)
        return new, alpha

    def bwd(beta, inputs):
        ls_k, lp_k, la_k = inputs
        g = gamma(ls_k, lp_k, la_k)                       # (B,4,2)
        # beta'(s) = max over u of beta(ns[s,u]) + g[s,u]
        new = (beta[:, ns] + g).max(-1)
        new = new - new.max(-1, keepdims=True)
        return new, beta

    seq = (l_sys.T, l_par.T, l_apr.T)  # scan over K
    alpha0 = jnp.full((B, 4), _NEG).at[:, 0].set(0.0)
    _, alphas = jax.lax.scan(fwd, alpha0, seq)            # (K,B,4) at k
    beta_K = jnp.zeros((B, 4))
    _, betas = jax.lax.scan(bwd, beta_K, seq, reverse=True)  # (K,B,4) at k+1

    def llr_k(ls_k, lp_k, la_k, alpha, beta):
        g = gamma(ls_k, lp_k, la_k)                       # (B,4,2)
        m = alpha[:, :, None] + g + beta[:, ns]           # (B,4,2)
        return m[..., 0].max(-1) - m[..., 1].max(-1)      # (B,)

    llr = jax.vmap(llr_k)(*seq, alphas, betas)            # (K,B)
    return llr.T


class TurboCodec:
    """Rate-1/3 turbo codec over fixed-size blocks.

    block_k: bits per block (static shape for jit).
    iters:   decoder half-iteration pairs.
    """

    def __init__(self, block_k: int = 1024, iters: int = 6, seed: int = 0):
        self.block_k = block_k
        self.iters = iters
        rng = np.random.default_rng(seed)
        self.perm = rng.permutation(block_k)
        self.inv_perm = np.argsort(self.perm)

    # ---- encode (host/NumPy: cheap, sequential-in-k shift register) ----

    def encode(self, bits: np.ndarray) -> tuple[np.ndarray, int]:
        """bits: flat uint8 array -> ((3, n_blocks, K) BPSK ±1, n_bits).

        Streams: [systematic, parity1, parity2(interleaved input)].
        """
        bits = np.asarray(bits, dtype=np.uint8).ravel()
        n = len(bits)
        k = self.block_k
        n_blocks = (n + k - 1) // k
        u = np.zeros((n_blocks, k), dtype=np.uint8)
        u.ravel()[:n] = bits
        p1 = rsc_encode(u)
        p2 = rsc_encode(u[:, self.perm])
        sym = 1.0 - 2.0 * np.stack([u, p1, p2]).astype(np.float32)
        return sym, n

    # ---- decode (device/JAX: the hot path) ----

    def decode(self, llr: np.ndarray, n_bits: int) -> np.ndarray:
        """llr: (3, n_blocks, K) channel LLRs -> flat uint8 bits."""
        l_sys, l_p1, l_p2 = (jnp.asarray(x, jnp.float32) for x in llr)
        perm = jnp.asarray(self.perm)
        inv = jnp.asarray(self.inv_perm)
        l_sys_i = l_sys[:, perm]

        def half_iters(carry, _):
            apr1 = carry
            full1 = _bcjr(l_sys, l_p1, apr1)
            ext1 = full1 - apr1 - l_sys
            apr2 = ext1[:, perm]
            full2 = _bcjr(l_sys_i, l_p2, apr2)
            ext2 = full2 - apr2 - l_sys_i
            return ext2[:, inv], full2

        apr = jnp.zeros_like(l_sys)
        apr, fulls = jax.lax.scan(half_iters, apr,
                                  jnp.arange(self.iters))
        final = fulls[-1][:, inv]  # a-posteriori LLR in natural order
        hard = np.asarray(final < 0, dtype=np.uint8)
        return hard.ravel()[:n_bits]

    # ---- channel helpers ----

    @staticmethod
    def awgn_llr(sym: np.ndarray, snr_db: float, key: jax.Array,
                 attack_pnr_db: float | None = None) -> np.ndarray:
        """BPSK over AWGN at Es/N0 = snr_db -> channel LLRs 2y/sigma^2.

        attack_pnr_db: optional worst-case physical-layer perturbation at
        the given perturbation-to-noise ratio — a component aligned
        AGAINST the transmitted symbol, power PNR·noise power (the
        reference's PNR convention, `models/transceiver.py:25-33`; for
        BPSK the sign-opposing direction is exactly the FGM optimum, so
        this reproduces the `Turbo+FGM.pkl` attack protocol without a
        differentiable receiver).
        """
        sigma = float(1.0 / np.sqrt(10.0 ** (snr_db / 10.0)))
        noise = sigma * jax.random.normal(key, sym.shape)
        y = sym + np.asarray(noise, np.float32)
        if attack_pnr_db is not None:
            amp = sigma * np.sqrt(10.0 ** (attack_pnr_db / 10.0))
            y = y - amp * np.sign(sym)
        return 2.0 * y / (sigma * sigma)
