import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

from tpuasr.losses import ctc_loss, rnnt_loss
from tpuasr.ops.ctc_pallas import ctc_loss_pallas
from tpuasr.ops.rnnt_pallas import rnnt_loss_pallas

# CTC
b,t,v,u = 8, 64, 412, 20
logits = rng.standard_normal((b,t,v)).astype(np.float32)
labels = rng.integers(6, v, size=(b,u)).astype(np.int32)
il = np.full(b, t, np.int32); il[1] = t-9
ll = np.full(b, u, np.int32); ll[1] = u-5
lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
t0=time.time()
ref = np.asarray(ctc_loss(lp, il, labels, ll, 5))
got = np.asarray(ctc_loss_pallas(lp, il, labels, ll, 5, interpret=False))
print("ctc fwd maxdiff", np.abs(ref-got).max(), f"({time.time()-t0:.1f}s)", flush=True)
g_ref = np.asarray(jax.grad(lambda x: jnp.sum(ctc_loss(x, il, labels, ll, 5)))(lp))
g_got = np.asarray(jax.grad(lambda x: jnp.sum(ctc_loss_pallas(x, il, labels, ll, 5, interpret=False)))(lp))
print("ctc grad maxdiff", np.abs(g_ref-g_got).max(), flush=True)

# RNNT
b,t,u,v = 8, 32, 12, 412
logits = rng.standard_normal((b,t,u+1,v)).astype(np.float32)
labels = rng.integers(6, v, size=(b,u)).astype(np.int32)
tl = np.full(b, t, np.int32); tl[1]=t-7
ul = np.full(b, u, np.int32); ul[1]=u-4
lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
ref = np.asarray(rnnt_loss(lp, labels, tl, ul, 5))
got = np.asarray(rnnt_loss_pallas(lp, labels, tl, ul, 5, interpret=False))
print("rnnt fwd maxdiff", np.abs(ref-got).max(), flush=True)
g_ref = np.asarray(jax.grad(lambda x: jnp.sum(rnnt_loss(x, labels, tl, ul, 5)))(lp))
g_got = np.asarray(jax.grad(lambda x: jnp.sum(rnnt_loss_pallas(x, labels, tl, ul, 5, interpret=False)))(lp))
print("rnnt grad maxdiff", np.abs(g_ref-g_got).max(), flush=True)

# fbank pallas
from tpuasr.audio import fbank
from tpuasr.config import FeatureConfig
wave = rng.standard_normal(48000).astype(np.float32)*0.1
a = np.asarray(fbank(wave, FeatureConfig(sample_rate=48000, use_pallas=False)))
bq = np.asarray(fbank(wave, FeatureConfig(sample_rate=48000, use_pallas=True)))
print("fbank maxdiff", np.abs(a-bq).max(), flush=True)
print("ALL TPU KERNEL CHECKS DONE", flush=True)

# fused joint+loss kernel on real TPU
from tpuasr.ops.rnnt_fused_pallas import rnnt_loss_fused_mean
from tpuasr.losses import rnnt_loss_from_logits as _rl
b,t,u,d,v,blank = 12, 64, 30, 256, 412, 5
enc_p = rng.standard_normal((b,t,d)).astype(np.float32)
pred_p = rng.standard_normal((b,u+1,d)).astype(np.float32)
w = (rng.standard_normal((d,v))/16).astype(np.float32)
bias = rng.standard_normal(v).astype(np.float32)*0.1
labels = rng.integers(6, v, size=(b,u)).astype(np.int32)
tl = np.full(b, t, np.int32); tl[1] = t-9
ul = np.full(b, u, np.int32); ul[1] = u-7
joined = jnp.tanh(jnp.asarray(enc_p)[:,:,None,:] + jnp.asarray(pred_p)[:,None,:,:])
logits = jnp.einsum("btud,dv->btuv", joined, w) + bias
ref = float(_rl(logits, labels, tl, ul, blank, "mean", use_pallas=False))
got = float(rnnt_loss_fused_mean(enc_p, pred_p, w, bias, labels, tl, ul, blank, interpret=False))
print("fused loss diff", abs(ref-got), flush=True)
g_ref = jax.grad(lambda e: _rl(jnp.einsum("btud,dv->btuv", jnp.tanh(e[:,:,None,:] + jnp.asarray(pred_p)[:,None,:,:]), w) + bias, labels, tl, ul, blank, "mean", use_pallas=False))(jnp.asarray(enc_p))
g_got = jax.grad(lambda e: rnnt_loss_fused_mean(e, pred_p, w, bias, labels, tl, ul, blank, interpret=False))(jnp.asarray(enc_p))
print("fused d_enc maxdiff", float(jnp.abs(g_ref-g_got).max()), flush=True)
import time
f = jax.jit(lambda e,p: rnnt_loss_fused_mean(e, p, w, bias, labels, tl, ul, blank, interpret=False))
fu = jax.jit(lambda lg: _rl(lg, labels, tl, ul, blank, "mean", use_pallas=True))
_ = f(enc_p, pred_p); jax.block_until_ready(_)
t0=time.perf_counter()
for _i in range(20): out=f(enc_p, pred_p)
jax.block_until_ready(out); print("fused fwd avg ms", (time.perf_counter()-t0)/20*1e3, flush=True)
print("FUSED TPU CHECK DONE", flush=True)
