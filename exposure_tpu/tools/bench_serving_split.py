"""Serving cost attribution: where does a trained-mix batch spend time?

Splits the full serving pipeline (bench.py --grouped --run ...) into
dependency-serialized slope-timed components on the real device:

  resize      512^2 u8 -> 64^2 f32 proxy downsample
  cnn         ONE policy.apply on the enriched proxies (per rollout step
              there are 1 of these + the 8-candidate filter math)
  plan        the full 5-step rollout (resize + 5x(cnn + candidates +
              select))  [f32 and bf16]
  replay      the grouped switchless replay with the run's REAL ids
  gather      jnp.take of the u8 batch by a permutation (the grouped
              path's data movement, both directions)

Methodology: slope timing — wall of N_big dispatches minus N_small,
completion forced by a tiny fetch (see tools/bench_truth.py; the
remote-TPU tunnel acks block_until_ready early, so naive timing lies).

Usage:
  python -m exposure_tpu.tools.bench_serving_split --run synthetic/<run>
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, n_small=5, n_big=20, rounds=2, fetch=None):
    def run(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn()
        (fetch or _default_fetch)(out)
        return time.time() - t0

    run(2)
    t_s = min(run(n_small) for _ in range(rounds))
    t_b = min(run(n_big) for _ in range(rounds))
    return max((t_b - t_s) / (n_big - n_small), 1e-9)


def _default_fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[:4]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run', default='synthetic/final-r2')
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--res', type=int, default=512)
    args = ap.parse_args()

    from exposure_tpu.core.checkpoint import restore_checkpoint
    from exposure_tpu.core.rollout import rollout
    from exposure_tpu.core.trainer import build_models, init_train_state
    from exposure_tpu.models.agent import enrich_image_input, \
        initial_states
    from exposure_tpu.ops.pallas_chain import GroupedChainRunner
    from exposure_tpu.utils.config import load_config

    config_name, _ = args.run.split('/', 1)
    cfg = load_config(config_name)
    cfg.name = args.run
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, seed=0)
    import os
    state, step = restore_checkpoint(os.path.join('models', args.run),
                                     state)
    print('# restored %s at step %d' % (args.run, step))

    b, res, s = args.batch, args.res, cfg.source_img_size
    rng = np.random.RandomState(0)
    imgs_u8 = jnp.asarray(rng.randint(0, 230, (b, res, res, 3), np.uint8))
    key = jax.random.PRNGKey(0)
    results = {}

    # resize
    resize = jax.jit(lambda im: jax.image.resize(
        im.astype(jnp.float32) * (1 / 255.), (b, s, s, 3), 'linear'))
    results['resize_ms'] = slope(lambda: resize(imgs_u8)) * 1000
    proxy = resize(imgs_u8)

    # cnn only (one enriched policy apply; rollout does 5)
    st0 = initial_states(b, cfg.num_state_dim)

    def cnn(params, px):
        enriched = enrich_image_input(cfg, px, st0)
        return policy.apply(params, enriched,
                            rngs={'dropout': jax.random.PRNGKey(0)})
    cnn_j = jax.jit(cnn)
    results['cnn1_ms'] = slope(
        lambda: cnn_j(state.gen_params, proxy)) * 1000

    bf_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), state.gen_params)
    bf_proxy = proxy.astype(jnp.bfloat16)
    results['cnn1_bf16_ms'] = slope(
        lambda: cnn_j(bf_params, bf_proxy)) * 1000

    # full plan (resize + rollout)
    def plan(params, im, k, bf):
        px = jax.image.resize(im.astype(jnp.float32) * (1 / 255.),
                              (b, s, s, 3), 'linear')
        if bf:
            px = px.astype(jnp.bfloat16)
        traj = rollout(policy, params, px, k, cfg=cfg, filters=filters,
                       is_train=0)
        return (traj.filter_ids, traj.params.astype(jnp.float32))

    plan_f32 = jax.jit(lambda p, im, k: plan(p, im, k, False))
    plan_bf16 = jax.jit(lambda p, im, k: plan(p, im, k, True))
    results['plan_f32_ms'] = slope(
        lambda: plan_f32(state.gen_params, imgs_u8, key)) * 1000
    results['plan_bf16_ms'] = slope(
        lambda: plan_bf16(bf_params, imgs_u8, key)) * 1000

    # real trajectory for replay
    ids, params = jax.device_get(plan_f32(state.gen_params, imgs_u8, key))
    uniq = sorted(set(map(tuple, np.asarray(ids).T.tolist())))
    print('# %d distinct signatures in batch: %r' % (len(uniq), uniq[:8]))

    runner = GroupedChainRunner(filters, fast_math=True)
    ids_j = jnp.asarray(ids)
    params_j = jnp.asarray(params)
    results['replay_grouped_ms'] = slope(
        lambda: runner(imgs_u8, ids_j, params_j), n_small=5, n_big=20,
        fetch=lambda o: np.asarray(o[0, :2, :2, 0])) * 1000

    # gather cost (one jnp.take of the whole u8 batch)
    perm = jnp.asarray(rng.permutation(b).astype(np.int32))
    take = jax.jit(lambda im, ix: jnp.take(im, ix, axis=0))
    results['gather_u8_ms'] = slope(lambda: take(imgs_u8, perm)) * 1000

    for k, v in sorted(results.items()):
        print('%-22s %8.2f ms' % (k, v))
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == '__main__':
    main()
