"""RNN-T joint network.

Parity: model/component/joint.py:7-69 / wenet/transducer/joint.py:8-106 —
pre-join linears on encoder and predictor outputs, broadcast add
[B,T,1,D] + [B,1,U,D], tanh, output linear to the vocabulary. `step` computes
a single (frame, token) cell for decoding without materializing [B,T,U,V].

The full [B,T,U,V] tensor is the training-memory hot spot (SURVEY §3.2); the
projected enc/pred activations are exposed separately (`project`) so losses
can tile/shard the final add+tanh+vocab matmul (model-axis sharding of V per
BASELINE.json north star).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpuasr.config import JointConfig

ACT = {"tanh": jnp.tanh, "relu": nn.relu, "gelu": nn.gelu}


class TransducerJoint(nn.Module):
    """Additive joint; with ``cfg.hat_joint`` the output head becomes the HAT
    factorization (wenet/transducer/joint.py:51-106): a LogSigmoid blank head
    plus a token head scaled by log(1 - p_blank) — the output is then already
    a normalized log-distribution (log_softmax is a no-op on it)."""

    cfg: JointConfig
    vocab_size: int
    dtype: jnp.dtype = jnp.float32
    blank_id: int = 0

    def setup(self):
        c = self.cfg
        if c.prejoin_linear:
            self.enc_ffn = nn.Dense(c.join_dim, dtype=self.dtype, name="enc_ffn")
            self.pred_ffn = nn.Dense(c.join_dim, dtype=self.dtype, name="pred_ffn")
        if c.postjoin_linear:
            self.post_ffn = nn.Dense(c.join_dim, dtype=self.dtype, name="post_ffn")
        if getattr(c, "hat_joint", False):
            self.blank_pred = nn.Dense(1, dtype=self.dtype, name="blank_pred")
            self.token_pred = nn.Dense(self.vocab_size - 1, dtype=self.dtype,
                                       name="token_pred")
        else:
            # raw params (not a Dense) so the fused joint+loss kernel
            # (tpuasr.ops.rnnt_fused_pallas) can consume them directly
            self.w_out = self.param(
                "ffn_out_kernel", nn.initializers.lecun_normal(),
                (c.join_dim, self.vocab_size),
            )
            self.b_out = self.param(
                "ffn_out_bias", nn.initializers.zeros, (self.vocab_size,)
            )

    def head_params(self):
        """(kernel [D, V], bias [V]) of the output projection."""
        return self.w_out, self.b_out

    def project(self, enc_out: jnp.ndarray, pred_out: jnp.ndarray):
        """Apply the pre-join linears: ([..., E], [..., P]) -> ([..., D], [..., D])."""
        return self.project_enc(enc_out), self.project_pred(pred_out)

    def project_enc(self, enc_out: jnp.ndarray) -> jnp.ndarray:
        return self.enc_ffn(enc_out) if self.cfg.prejoin_linear else enc_out

    def project_pred(self, pred_out: jnp.ndarray) -> jnp.ndarray:
        return self.pred_ffn(pred_out) if self.cfg.prejoin_linear else pred_out

    def head_from_projected(self, joined: jnp.ndarray) -> jnp.ndarray:
        """[..., D] pre-activation sum -> [..., V] logits."""
        return self._head(joined)

    def _head(self, joined: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.postjoin_linear:
            joined = self.post_ffn(joined)
        if getattr(self.cfg, "hat_joint", False):
            import jax

            blank_logp = nn.log_sigmoid(
                self.blank_pred(jnp.tanh(joined)).astype(jnp.float32)
            )  # [..., 1]
            scale = jnp.log(jnp.clip(1.0 - jnp.exp(blank_logp), min=1e-6))
            label_logp = jax.nn.log_softmax(
                self.token_pred(ACT[self.cfg.activation](joined)).astype(jnp.float32),
                axis=-1,
            ) + scale  # [..., V-1]
            # insert the blank column at blank_id
            i = self.blank_id
            return jnp.concatenate(
                [label_logp[..., :i], blank_logp, label_logp[..., i:]], axis=-1
            )
        act = ACT[self.cfg.activation](joined)
        return (
            jnp.dot(act, self.w_out.astype(act.dtype)) + self.b_out.astype(act.dtype)
        )

    def __call__(self, enc_out: jnp.ndarray, pred_out: jnp.ndarray) -> jnp.ndarray:
        """([B,T,E], [B,U,P]) -> [B,T,U,V] logits."""
        enc_p, pred_p = self.project(enc_out, pred_out)
        joined = enc_p[:, :, None, :] + pred_p[:, None, :, :]
        return self._head(joined)

    def step(self, enc_t: jnp.ndarray, pred_u: jnp.ndarray) -> jnp.ndarray:
        """([B,E], [B,P]) -> [B,V] logits for one (frame, token) pair."""
        enc_p, pred_p = self.project(enc_t, pred_u)
        return self._head(enc_p + pred_p)
