import time, sys
import jax, jax.numpy as jnp, numpy as np
from exposure_tpu.utils import load_config
from exposure_tpu.ops.pallas_chain import (
    pallas_apply_filter_chain, pallas_apply_filter_chain_dynamic,
    GroupedChainRunner)
from exposure_tpu.ops.chain import apply_filter_chain
from exposure_tpu.ops.filters import max_filter_parameters

cfg = load_config('example')
filters = [f(cfg) for f in cfg.filters]
rng = np.random.RandomState(0)
B, H, W, K = 256, 512, 512, 5
img = (rng.rand(B, H, W, 3) * 255).astype(np.uint8)
# trained-like mix: ~6 distinct signatures over the batch
sig_pool = [rng.randint(0, len(filters), K) for _ in range(6)]
assign = rng.randint(0, 6, B)
ids = np.stack([sig_pool[a] for a in assign], axis=1).astype(np.int32)  # [K,B]
max_p = max_filter_parameters(filters)
params = np.zeros((K, B, max_p), np.float32)
for s in range(K):
    for i in range(B):
        f = filters[ids[s, i]]
        n = f.get_num_filter_parameters()
        raw = rng.randn(1, n).astype(np.float32)
        params[s, i, :n] = np.asarray(f.filter_param_regressor(jnp.asarray(raw))).reshape(-1)
img_d, ids_d, params_d = jnp.asarray(img), jnp.asarray(ids), jnp.asarray(params)

fast = True
dyn = jax.jit(lambda im, i, p: pallas_apply_filter_chain_dynamic(im, i, p, filters, fast_math=fast))
# round-5 dispatch variants (VERDICT r4 #5): one lax.switch per step
# (scf.index_switch if Mosaic lowers it as real control flow) and a
# two-level pl.when guard tree
dyn_sw = jax.jit(lambda im, i, p: pallas_apply_filter_chain_dynamic(
    im, i, p, filters, fast_math=fast, dispatch='switch'))
dyn_tr = jax.jit(lambda im, i, p: pallas_apply_filter_chain_dynamic(
    im, i, p, filters, fast_math=fast, dispatch='tree'))
sw  = jax.jit(lambda im, i, p: pallas_apply_filter_chain(im, i, p, filters, fast_math=fast))

def slope(fn, chain=True, n_small=10, n_big=40):
    out = fn(img_d, ids_d, params_d); np.asarray(out[0,:2,:2,0])
    def run(n):
        t0=time.time(); o=img_d
        for _ in range(n):
            o = fn(o if chain else img_d, ids_d, params_d)
        np.asarray(o[0,:2,:2,0]); return time.time()-t0
    ts=min(run(n_small) for _ in range(2)); tb=min(run(n_big) for _ in range(2))
    return (tb-ts)/(n_big-n_small)

# correctness vs jnp chain on device first
out_dyn = np.asarray(dyn(img_d, ids_d, params_d))
ref = apply_filter_chain(img_d.astype(jnp.float32)/255.0, ids_d, params_d, filters)
ref_u8 = np.asarray(jnp.round(jnp.clip(ref,0,1)*255).astype(jnp.uint8)).astype(np.int64)
err = np.abs(out_dyn.astype(np.int64)-ref_u8)
print('dyn on-device max LSB err (fast_math=%s): %d  frac>1: %.2e' % (fast, err.max(), (err>1).mean()))

t_dyn = slope(dyn)
print('dyn(when)  : %.2f ms/batch  -> %.0f img/s (kernel only)' % (t_dyn*1e3, B/t_dyn))
for name, fn in (('dyn(switch)', dyn_sw), ('dyn(tree)', dyn_tr)):
    try:
        o = np.asarray(fn(img_d, ids_d, params_d)).astype(np.int64)
        e = np.abs(o - ref_u8)
        t = slope(fn)
        print('%-11s: %.2f ms/batch  -> %.0f img/s  (max LSB err %d)'
              % (name, t*1e3, B/t, e.max()))
    except Exception as exc:
        print('%-11s: FAILED to compile/run: %s' % (name, str(exc)[:200]))
t_sw = slope(sw)
print('switch: %.2f ms/batch  -> %.0f img/s' % (t_sw*1e3, B/t_sw))

runner = GroupedChainRunner(filters, fast_math=fast, fused_set_limit=0)
def grp(im, i, p): return runner(im, i, p)
t_g = slope(grp)
print('grouped(sync): %.2f ms/batch -> %.0f img/s (incl host grouping)' % (t_g*1e3, B/t_g))

# batch_chunk sweep (round 5): the dyn path emits one pallas_call per
# ``batch_chunk`` images inside the jit — larger chunks mean fewer
# kernel launches (B/chunk per batch) at identical math; probe whether
# launch count is visible at all on-device
for chunk in (16, 32, 64):
    fn = jax.jit(lambda im, i, p, c=chunk: pallas_apply_filter_chain_dynamic(
        im, i, p, filters, fast_math=fast, batch_chunk=c))
    try:
        t = slope(fn)
        print('dyn(when,chunk=%2d): %.2f ms/batch -> %.0f img/s'
              % (chunk, t*1e3, B/t))
    except Exception as exc:
        print('dyn(when,chunk=%2d): FAILED: %s' % (chunk, str(exc)[:160]))
