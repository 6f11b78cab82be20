"""The Trainer: owns the models, train state, device data and the loop.

TPU-native counterpart of the reference ``GAN`` class (net.py:18-877):
same run layout (``models/<name>/`` with scripts backup, log tee, images
dir, periodic checkpoints) and the same training choreography
(citers bursts, iter-0 warmup at lr 0, net.py:307-364) — but the per
iteration work is ONE jitted sharded call (see core/steps.py) and the
input pipeline is device-resident, so the host loop only dispatches and
occasionally reads scalars."""

import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from exposure_tpu.core.checkpoint import (
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
)
from exposure_tpu.core.replay import PoolState
from exposure_tpu.core.rollout import rollout
from exposure_tpu.core.steps import build_outer_step
from exposure_tpu.core.train_state import TrainState, make_optimizer
from exposure_tpu.models import CriticNet, PolicyNet
from exposure_tpu.parallel.mesh import DATA_AXIS, data_parallel_mesh
from exposure_tpu.utils import MedianWindow, MetricLogger, Tee
from exposure_tpu.utils.image_io import make_image_grid, write_image


_REALTIME_VIS_FAILED = [False]


def _show_realtime(img, title):
    """Live visualization window (reference net.py:547-549's cv2 window);
    degrades to a one-time notice on headless machines."""
    if _REALTIME_VIS_FAILED[0]:
        return
    try:
        import cv2
        bgr = (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8)
        cv2.imshow(title, bgr)
        cv2.waitKey(1)
    except Exception as e:
        _REALTIME_VIS_FAILED[0] = True
        print('# realtime_vis unavailable (%s); continuing headless' % e)


def plan_fused_chunk(it, cfg, n_fuse, supervised):
    """How many consecutive iterations starting at ``it`` can run in one
    fused dispatch without crossing a schedule or bookkeeping boundary.

    Returns 1 (single-dispatch path) for special iterations (warmup,
    critic bursts) and otherwise the largest c <= n_fuse such that
    [it, it+c) contains no burst iteration and ends exactly on a
    logging boundary (multiples of 10) without crossing checkpoint or
    visualization boundaries."""
    def special(i):
        if i == 0:
            return True
        if supervised:
            return False
        return cfg.gan == 'w' and (i < cfg.critic_initialization or
                                   i % 500 == 0)

    if n_fuse <= 1 or special(it):
        return 1
    end = min(it + n_fuse - 1,               # chunk budget
              ((it // 10) + 1) * 10,         # end ON a logging boundary
              cfg.max_iter_step)
    ckpt = cfg.get('checkpoint_interval', 500)
    for j in range(it, end + 1):
        if j > it and special(j):
            return j - it
        if (j + 1) % ckpt == 0 and j < end:
            return j - it + 1              # end ON the checkpoint iter
    return end - it + 1


def pool_health_warning(citers, supervised, terminated_frac):
    """Guard against the silent failure mode where the critic trains
    while the replay pool holds no terminated records: our
    ``sample_terminated`` falls back to uniform sampling there (the
    reference hard-asserts instead, replay_memory.py:260), which would
    quietly feed the critic non-terminated images."""
    if citers > 0 and not supervised and terminated_frac <= 0:
        return ('critic phase ran with ZERO terminated records in the '
                'replay pool; critic batches fell back to uniform '
                'sampling over unterminated records — check the warmup '
                'schedule (reference replay_memory.py:260 hard-asserts '
                'here)')
    return None


def build_models(cfg):
    """Instantiate filters + the three networks from a config."""
    filters = [f(cfg) for f in cfg.filters]
    policy = PolicyNet(
        filter_output_dims=tuple(
            f.get_num_filter_parameters() + f.get_num_mask_parameters()
            for f in filters),
        feature_extractor_dims=cfg.feature_extractor_dims,
        base_channels=cfg.base_channels,
        fc1_size=cfg.fc1_size,
        dropout_keep_prob=cfg.dropout_keep_prob)
    critic = CriticNet(cfg.base_channels, cfg.fc1_size)
    value = CriticNet(cfg.base_channels, cfg.fc1_size)
    return filters, policy, critic, value


def init_train_state(cfg, policy, critic, value, seed=0):
    key = jax.random.PRNGKey(seed)
    k_g, k_c, k_v, k_d = jax.random.split(key, 4)
    img = jnp.zeros((2, cfg.source_img_size, cfg.source_img_size,
                     cfg.real_img_channels + cfg.num_state_dim))
    gen_params = policy.init({'params': k_g, 'dropout': k_d}, img)
    plain = jnp.zeros((2, cfg.source_img_size, cfg.source_img_size,
                       cfg.real_img_channels))
    crit_params = critic.init(k_c, plain)
    val_params = value.init(k_v, plain, jnp.zeros((2, cfg.num_state_dim)))
    tx = make_optimizer(cfg.get('adam_beta1', 0.5), cfg.get('adam_beta2', 0.9))
    return TrainState.create(gen_params, val_params, crit_params, tx), tx


class Trainer:

    def __init__(self, cfg, restore=False, num_devices=None, data_root='.',
                 model_root='models'):
        self.cfg = cfg
        self.data_root = data_root
        assert cfg.gan == 'w' or cfg.gan == 'ls'
        self.dir = os.path.join(model_root, cfg.name)
        safe = cfg.name.replace('/', '-')
        self.image_dir = os.path.join(self.dir, 'images-' + safe)
        self.dump_dir = os.path.join(self.dir, 'dump-' + safe)
        for d in (self.dir, self.image_dir, self.dump_dir):
            os.makedirs(d, exist_ok=True)

        self.tee = None
        if not restore:
            self.backup_scripts()
            self.tee = Tee(os.path.join(self.dir, 'log.txt'))

        self.mesh = data_parallel_mesh(num_devices)
        self.n_dev = self.mesh.shape[DATA_AXIS]
        print('# exposure_tpu: %d-device data-parallel mesh' % self.n_dev)

        self.filters, self.policy, self.critic, self.value = build_models(cfg)
        self.state, self.tx = init_train_state(
            cfg, self.policy, self.critic, self.value, cfg.get('seed', 0))

        # ---------------- data: device-resident or streaming ----------
        self.fake_provider = cfg.fake_data_provider()
        self.real_provider = cfg.real_data_provider()
        shard = NamedSharding(self.mesh, P(DATA_AXIS))
        self.streaming = bool(cfg.get('stream_data', False))
        if self.streaming:
            # host-assembled fresh data per call (native hostloader path)
            self.fake_images = self.real_images = None
            self.fake_meta = self.real_meta = None
        else:
            fake_pack = self.fake_provider.device_pack()
            real_pack = self.real_provider.device_pack()
            self.fake_meta = (fake_pack.output_size, fake_pack.augment)
            self.real_meta = (real_pack.output_size, real_pack.augment)
            self.fake_images = jax.device_put(
                self._pad_to_devices(fake_pack.images), shard)
            self.real_images = jax.device_put(
                self._pad_to_devices(real_pack.images), shard)

        # ---------------- replay pool ----------------
        self.supervised = bool(cfg.get('supervised', False))
        pool_batch, _ = self.fake_provider.get_next_batch(
            cfg.replay_memory_size)
        if self.supervised:
            # paired provider yields [P, 2, S, S, C] (input, ground truth)
            pool_images = jnp.asarray(pool_batch[:, 0])
            pool_gt = jax.device_put(jnp.asarray(pool_batch[:, 1]), shard)
        else:
            pool_images = jnp.asarray(pool_batch)
            pool_gt = None
        pool = PoolState.create(pool_images, cfg.num_state_dim, pool_gt)
        self.pool = pool.replace(
            images=jax.device_put(pool.images, shard),
            states=jax.device_put(pool.states, shard))

        self._steps = {}
        self._logger = MetricLogger(os.path.join(self.dir, 'metrics.jsonl'))
        self._rollout_fn = None
        self._score_fn = None

    def _pad_to_devices(self, arr):
        n = arr.shape[0]
        r = (-n) % self.n_dev
        if r:
            arr = np.concatenate([arr, arr[:r]], axis=0)
        return jnp.asarray(arr)

    def backup_scripts(self):
        """Snapshot the config (and repo configs) into the run dir so runs
        are self-describing (reference net.py:672-681)."""
        script_dir = os.path.join(self.dir, 'scripts')
        os.makedirs(script_dir, exist_ok=True)
        src = self.cfg.get('config_path', None)
        candidates = []
        if src:
            candidates.append(src)
        here = os.getcwd()
        for d in (here, os.path.join(here, 'configs')):
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    if fn.startswith('config_') and fn.endswith('.py'):
                        candidates.append(os.path.join(d, fn))
        for path in candidates:
            try:
                shutil.copy(path, script_dir)
            except (IOError, shutil.SameFileError):
                pass

    # ------------------------------------------------------------------
    def _get_step(self, giters, citers):
        key = (self.streaming, giters, citers)
        if key not in self._steps:
            t0 = time.time()
            if self.streaming:
                from exposure_tpu.core.steps import \
                    build_streaming_outer_step
                self._steps[key] = build_streaming_outer_step(
                    self.cfg, self.policy, self.critic, self.value,
                    self.filters, self.tx, self.mesh, giters, citers)
            else:
                self._steps[key] = build_outer_step(
                    self.cfg, self.policy, self.critic, self.value,
                    self.filters, self.tx, self.mesh, self.fake_meta,
                    self.real_meta, giters, citers)
            print('# compiled outer step (giters=%d, citers=%d) handle in '
                  '%.1fs' % (giters, citers, time.time() - t0))
        return self._steps[key]

    def _assemble_stream(self, giters, citers):
        """Host-side fresh-data assembly for one streaming call."""
        cfg = self.cfg
        b, p = cfg.batch_size, cfg.replay_memory_size
        chunk = 2 * b + p
        g_fresh = np.empty((giters, chunk) +
                           (cfg.source_img_size, cfg.source_img_size,
                            cfg.real_img_channels), np.float32)
        for i in range(giters):
            g_fresh[i] = self.fake_provider.get_next_batch(chunk)[0]
        if citers > 0:
            real = np.stack([self.real_provider.get_next_batch(b)[0]
                             for _ in range(citers)])
        else:
            real = np.zeros((0, b, cfg.source_img_size,
                             cfg.source_img_size, cfg.real_img_channels),
                            np.float32)
        return jnp.asarray(g_fresh), jnp.asarray(real)

    def _stream_bundle(self, giters, citers):
        """Fetch a streaming data bundle, overlapping host assembly with
        device execution via a single-slot prefetcher per shape."""
        from exposure_tpu.utils.prefetch import AsyncPrefetcher
        if not hasattr(self, '_prefetchers'):
            self._prefetchers = {}
        key = (giters, citers)
        if key not in self._prefetchers:
            self._prefetchers[key] = AsyncPrefetcher(
                self._assemble_stream, args=key)
        return self._prefetchers[key].get_next()

    def train(self):
        """Run the training loop; set ``cfg.profile_dir`` to capture a
        jax.profiler device trace of iterations 20-30 (TensorBoard-
        compatible; the reference's RunMetadata equivalent,
        net.py:310-354)."""
        cfg = self.cfg
        profile_dir = cfg.get('profile_dir', None)
        start_t = time.time()
        g_pool = MedianWindow(cfg.median_filter_size)
        v_pool = MedianWindow(cfg.median_filter_size)
        emd_pool = MedianWindow(cfg.median_filter_size)
        metrics_last = None
        base_key = jax.random.PRNGKey(cfg.get('seed', 0) + 1)
        start_iter = int(self.state.step)

        n_fuse = 1 if self.streaming else \
            int(cfg.get('iters_per_dispatch', 1))
        it = start_iter
        while it <= cfg.max_iter_step:
            iter_t = time.time()
            chunk = plan_fused_chunk(it, cfg, n_fuse, self.supervised)
            if chunk > 1:
                citers = cfg.citers if not self.supervised else 0
                metrics = self._run_fused(it, chunk, base_key)
                it_end = it + chunk - 1
                self.state = self.state.replace(step=jnp.int32(it_end + 1))
                it = it_end
                self._post_iteration(it, iter_t, chunk, citers, metrics,
                                     g_pool, v_pool, emd_pool, start_t,
                                     start_iter)
                metrics_last = metrics
                it += 1
                continue

            progress = it / cfg.max_iter_step
            if self.supervised:
                # no discriminator updates in supervised mode
                # (reference net.py:360-364)
                citers = 0
            elif cfg.gan == 'w' and (it < cfg.critic_initialization or
                                     it % 500 == 0):
                citers = cfg.get('critic_burst', 100)
            else:
                citers = cfg.citers
            giters = cfg.get('warmup_giters', 100) if it == 0 else cfg.giters
            lr_g = 0.0 if it == 0 else cfg.lr_g(it)
            lr_c = cfg.lr_c(it)

            if profile_dir and it == 20:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and it == 30:
                jax.profiler.stop_trace()

            # Every (giters, citers) schedule (normal iters, the iter-0
            # warmup, citers bursts) is composed from just TWO compiled
            # programs — a generator-phase step and a critic-phase step.
            # Remote compiles cost minutes; per-call dispatch costs
            # microseconds.
            it_key = jax.random.fold_in(base_key, it)

            def run(step, sub, lr_g_, phase):
                if self.streaming:
                    if phase == 'g':
                        data = self._stream_bundle(cfg.giters, 0)
                    else:
                        data = self._stream_bundle(0, cfg.citers)
                else:
                    data = (self.fake_images, self.real_images)
                return step(self.state, self.pool, *data,
                            jax.random.fold_in(it_key, sub),
                            jnp.float32(lr_g_), jnp.float32(lr_c),
                            jnp.float32(progress))

            g_step = self._get_step(cfg.giters, 0)
            sub = 0
            for _ in range(max(giters // cfg.giters, 1)):
                self.state, self.pool, metrics = run(g_step, sub, lr_g,
                                                     'g')
                sub += 1
            if citers > 0:
                c_step = self._get_step(0, cfg.citers)
                c_metrics = metrics
                for _ in range(max(citers // cfg.citers, 1)):
                    self.state, self.pool, c_metrics = run(c_step, sub,
                                                           lr_g, 'c')
                    sub += 1
                metrics = metrics._replace(
                    emd=c_metrics.emd,
                    critic_gradient_norm=c_metrics.critic_gradient_norm,
                    pool_avg_trajectory=c_metrics.pool_avg_trajectory,
                    pool_terminated_frac=c_metrics.pool_terminated_frac)
            self.state = self.state.replace(step=jnp.int32(it + 1))
            self._post_iteration(it, iter_t, 1, citers, metrics, g_pool,
                                 v_pool, emd_pool, start_t, start_iter)
            metrics_last = metrics
            it += 1

        return metrics_last

    def _run_fused(self, it, chunk, base_key):
        """Dispatch ``chunk`` plain iterations as one fused scan call."""
        cfg = self.cfg
        citers = 0 if self.supervised else cfg.citers
        key = ('fused', cfg.giters, citers, chunk)
        if key not in self._steps:
            from exposure_tpu.core.steps import build_fused_iterations_step
            t0 = time.time()
            self._steps[key] = build_fused_iterations_step(
                cfg, self.policy, self.critic, self.value, self.filters,
                self.tx, self.mesh, self.fake_meta, self.real_meta,
                cfg.giters, citers, chunk)
            print('# compiled fused step (giters=%d, citers=%d, n=%d) '
                  'handle in %.1fs' % (cfg.giters, citers, chunk,
                                       time.time() - t0))
        iters = np.arange(it, it + chunk, dtype=np.int32)
        lr_gs = jnp.asarray([cfg.lr_g(j) for j in iters], jnp.float32)
        lr_cs = jnp.asarray([cfg.lr_c(j) for j in iters], jnp.float32)
        progs = jnp.asarray(iters / cfg.max_iter_step, jnp.float32)
        self.state, self.pool, metrics = self._steps[key](
            self.state, self.pool, self.fake_images, self.real_images,
            base_key, jnp.asarray(iters), lr_gs, lr_cs, progs)
        return metrics

    def _post_iteration(self, it, iter_t, chunk, citers, metrics, g_pool,
                        v_pool, emd_pool, start_t, start_iter):
        """Per-iteration bookkeeping (logging, checkpoints, viz) shared by
        the single-dispatch and fused paths; ``it`` is the LAST iteration
        the dispatch covered."""
        cfg = self.cfg
        if it % 10 == 0:
            m = jax.device_get(metrics)
            if not all(np.isfinite(v) for v in m):
                # failure detection: surface divergence immediately
                # with a diagnostic dump instead of training on NaNs
                dump = os.path.join(self.dir,
                                    'diverged-%06d.msgpack' % it)
                save_checkpoint(self.dir, self.state, it, keep=10)
                raise FloatingPointError(
                    'non-finite training metrics at iter %d: %s '
                    '(state dumped near %s)' % (it, m, dump))
            warn = pool_health_warning(citers, self.supervised,
                                       m.pool_terminated_frac)
            if warn:
                print('# WARNING (it %d): %s' % (it, warn))
            g_pool.add(m.g_loss)
            v_pool.add(m.v_loss)
            emd_pool.add(m.emd)
            ms = 1000 * (time.time() - iter_t) / chunk
            print('it%6d,%5.0f ms/it, g_loss=%.2f, v_loss=%.2f, '
                  'EMD=%.3f, cgn=%.2f' %
                  (it, ms, g_pool.median(), v_pool.median(),
                   emd_pool.median(), m.critic_gradient_norm))
            self._logger.log(it, g_loss=m.g_loss, v_loss=m.v_loss,
                             emd=m.emd, cgn=m.critic_gradient_norm,
                             reward=m.reward,
                             pool_avg_traj=m.pool_avg_trajectory,
                             pool_term_frac=m.pool_terminated_frac,
                             ms_per_iter=ms)

        if it % 100 == 0:
            m = jax.device_get(metrics)
            ela = (time.time() - start_t) / 60.0
            eta = (time.time() - start_t) / (it - start_iter + 1) / \
                3600 * (cfg.max_iter_step - it)
            print('#--------------------------------------------')
            print('# Task: %s  ela. %.2f min  ETA: %.1f h' %
                  (cfg.name, ela, eta))
            print('# Replay pool: avg. traj. %.2f, terminated %.0f%%' %
                  (m.pool_avg_trajectory,
                   100 * m.pool_terminated_frac))

        if (it + 1) % cfg.get('checkpoint_interval', 500) == 0:
            path = save_checkpoint(self.dir, self.state, it + 1)
            print('# checkpoint saved:', path)

        wii = cfg.write_image_interval
        if wii and any(j % wii == 0
                       for j in range(it - chunk + 1, it + 1)):
            try:
                self.visualize(it)
            except Exception as e:  # viz must never kill training
                print('# visualization failed:', e)

    # ------------------------------------------------------------------
    def restore(self, ckpt=None):
        self.state, step = restore_checkpoint(self.dir, self.state, ckpt)
        print('# restored checkpoint at step', step)
        return step

    def latest_checkpoint(self):
        return latest_checkpoint_step(self.dir)

    # ------------------------------------------------------------------
    def run_rollout(self, images, key=None, is_train=None, num_steps=None):
        """Jitted K-step rollout with the current policy weights."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        if is_train is None:
            is_train = cfg.test_random_walk
        if self._rollout_fn is None:
            self._rollout_fn = jax.jit(
                lambda params, imgs, k, it: rollout(
                    self.policy, params, imgs, k, cfg=cfg,
                    filters=self.filters, is_train=it,
                    num_steps=num_steps or cfg.test_steps))
        return self._rollout_fn(self.state.gen_params, jnp.asarray(images),
                                key, jnp.int32(int(is_train)))

    def critic_scores(self, images):
        """Centered critic scores for a host batch (reference
        centered_fake_logit, net.py:166-168)."""
        if self._score_fn is None:
            self._score_fn = jax.jit(
                lambda p, x: self.critic.apply(p, x)[:, 0])
        logits = self._score_fn(self.state.crit_params, jnp.asarray(images))
        return np.asarray(logits) - float(self.state.ema.value)

    def state_values(self, images, states):
        """V(s) for host batches (reference new_value, net.py:76-97)."""
        if getattr(self, '_value_fn', None) is None:
            self._value_fn = jax.jit(
                lambda p, x, s: self.value.apply(p, x, s)[:, 0])
        return np.asarray(self._value_fn(self.state.val_params,
                                         jnp.asarray(images),
                                         jnp.asarray(states)))

    def critic_gradients(self, images):
        """Per-pixel d(critic logit)/d(image), display-scaled (reference
        fake_gradients net.py:169-171 + gradient_processor net.py:409-418:
        10*grads + 0.5 for WGAN)."""
        if getattr(self, '_grad_fn', None) is None:
            self._grad_fn = jax.jit(jax.grad(
                lambda x, p: jnp.sum(self.critic.apply(p, x))))
        grads = self._grad_fn(jnp.asarray(images), self.state.crit_params)
        return np.clip(10.0 * np.asarray(grads) + 0.5, 0, 1)

    def visualize(self, it):
        """Write the periodic visualization grid (reference
        net.py:420-552): rollout trajectories with per-step
        decision/operation panels on top; pool / generated / real sample
        grids with critic-score stamps below."""
        from exposure_tpu.utils.viz import (
            draw_score,
            draw_step_panels,
        )
        cfg = self.cfg
        n = min(cfg.num_samples, 16)
        raw, _ = self.fake_provider.get_next_batch(n)
        if self.supervised:
            raw = raw[:, 0]
        traj = self.run_rollout(raw, key=jax.random.PRNGKey(it))
        steps = np.asarray(traj.images)  # [K, n, S, S, C]
        k_steps = steps.shape[0]

        # critic-gradient images, scores and values for every
        # (sample, step) at once
        flat_steps = steps.reshape(-1, *steps.shape[2:])
        grad_imgs = self.critic_gradients(flat_steps).reshape(steps.shape)
        scores = self.critic_scores(flat_steps).reshape(steps.shape[:2])
        flat_states = np.asarray(traj.states).reshape(-1,
                                                      cfg.num_state_dim)
        values = self.state_values(flat_steps, flat_states).reshape(
            steps.shape[:2])
        in_scores = self.critic_scores(np.asarray(raw))

        from exposure_tpu.utils.viz import draw_value_reward_score

        rows = []
        for b in range(min(n, 4)):
            img_row = [np.asarray(raw[b])]
            for k in range(k_steps):
                prev = in_scores[b] if k == 0 else scores[k - 1, b]
                reward = (scores[k, b] - prev) * \
                    cfg.critic_logit_multiplier
                img_row.append(draw_value_reward_score(
                    steps[k, b], values[k, b], reward, scores[k, b],
                    cfg.gan))
            blank = np.ones_like(img_row[0])
            grad_row = [blank] + [grad_imgs[k, b] for k in range(k_steps)]
            dec_row, op_row = [blank], [blank]
            mask_row = [blank] if cfg.masking else None
            for k in range(k_steps):
                dbg = {'pdf': np.asarray(traj.pdfs[k, b]),
                       'filter_id': int(traj.filter_ids[k, b]),
                       'filter_parameters':
                           np.asarray(traj.params[k, b])}
                nparam = self.filters[dbg['filter_id']] \
                    .get_num_filter_parameters()
                dbg['filter_parameters'] = dbg['filter_parameters'][:nparam]
                dec, op = draw_step_panels(self.filters, dbg,
                                           size=img_row[0].shape[0])
                dec_row.append(dec)
                op_row.append(op)
                if mask_row is not None:
                    from exposure_tpu.utils.viz import draw_mask_panel
                    step_input = np.asarray(raw[b]) if k == 0 \
                        else steps[k - 1, b]
                    mask_row.append(draw_mask_panel(
                        self.filters[dbg['filter_id']], step_input,
                        np.asarray(traj.mask_params[k, b])))

            def hcat(row):
                return np.hstack([np.pad(r, ((1, 1), (1, 1), (0, 0)),
                                         constant_values=1.0) for r in row])
            panel_rows = [hcat(img_row), hcat(grad_row), hcat(dec_row),
                          hcat(op_row)]
            if mask_row is not None:
                panel_rows.append(hcat(mask_row))
            rows.append(np.vstack(panel_rows))
        upper = np.vstack(rows)

        pool_imgs = np.asarray(jax.device_get(self.pool.images))[:n]
        real_imgs, _ = self.real_provider.get_next_batch(n)
        final = steps[-1]
        per_row = 8

        def grid(x, stamp=True):
            x = np.asarray(x)[:per_row * (len(x) // per_row)]
            if len(x) == 0:
                return None
            if stamp and cfg.vis_draw_critic_scores:
                scores = self.critic_scores(x)
                x = np.stack([draw_score(im, s, cfg.gan)
                              for im, s in zip(x, scores)])
            return make_image_grid(x, per_row=per_row)

        lowers = [g for g in (grid(pool_imgs), grid(final),
                              grid(real_imgs)) if g is not None]
        lower = np.vstack(lowers)
        w = max(upper.shape[1], lower.shape[1])

        def padw(x):
            return np.pad(x, ((0, 0), (0, w - x.shape[1]), (0, 0)),
                          constant_values=1.0)
        img = np.vstack([padw(upper), np.ones((8, w, 3), np.float32),
                         padw(lower)])
        write_image(os.path.join(self.image_dir, '%06d.png' % it),
                    np.clip(img, 0, 1))
        if cfg.get('realtime_vis', False):
            _show_realtime(img, 'exposure_tpu: ' + cfg.name)
