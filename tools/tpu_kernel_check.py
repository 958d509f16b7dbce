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

# fused FFN kernel on real TPU (ops/ffn_pallas.py): deterministic parity vs
# the module chain + dropout-mode finite-difference grad probe (the compiled
# hardware-PRNG path — CPU CI only exercises the interpret/hash path)
from tpuasr.ops.ffn_pallas import fused_ffn
import flax.linen as _fnn
d_, h_ = 256, 1024
xr = jnp.asarray(rng.standard_normal((600, d_)).astype(np.float32))
gsc = jnp.asarray(1 + 0.1*rng.standard_normal(d_).astype(np.float32))
gbi = jnp.asarray(0.1*rng.standard_normal(d_).astype(np.float32))
w1_ = jnp.asarray((rng.standard_normal((d_, h_))/16).astype(np.float32))
b1_ = jnp.asarray(0.1*rng.standard_normal(h_).astype(np.float32))
w2_ = jnp.asarray((rng.standard_normal((h_, d_))/32).astype(np.float32))
b2_ = jnp.asarray(0.1*rng.standard_normal(d_).astype(np.float32))
def _ffn_ref(x):
    xn = _fnn.LayerNorm(epsilon=1e-6).apply({"params": {"scale": gsc, "bias": gbi}}, x)
    hh = xn @ w1_ + b1_
    return x + 0.5 * ((hh * jax.nn.sigmoid(hh)) @ w2_ + b2_)
seed0 = jnp.zeros((), jnp.int32)
out_f = fused_ffn(xr, gsc, gbi, w1_, b1_, w2_, b2_, seed0, 0.1, 0.5, True)
print("fused ffn fwd maxdiff", float(jnp.abs(out_f - _ffn_ref(xr)).max()), flush=True)
gf = jax.grad(lambda x: jnp.sum(fused_ffn(x, gsc, gbi, w1_, b1_, w2_, b2_, seed0, 0.1, 0.5, True)**2))(xr)
gr = jax.grad(lambda x: jnp.sum(_ffn_ref(x)**2))(xr)
print("fused ffn dx maxdiff", float(jnp.abs(gf - gr).max()), flush=True)
# dropout mode: fwd/bwd mask agreement via finite differences on hardware
seedd = jnp.asarray(77, jnp.int32)
lossd = lambda x: jnp.sum(fused_ffn(x, gsc, gbi, w1_, b1_, w2_, b2_, seedd, 0.5, 1.0, False))
gx = jax.grad(lossd)(xr)
eps, probe = 1e-2, jnp.zeros_like(xr).at[3, 5].set(1.0)
fd = (lossd(xr + eps*probe) - lossd(xr - eps*probe)) / (2*eps)
print("fused ffn dropout fd vs grad", float(jnp.vdot(gx, probe)), float(fd), flush=True)
print("FUSED FFN TPU CHECK DONE", flush=True)
