"""Serving: a one-object batch retouching pipeline.

The production-facing API the reference never had: load a trained run
once, then ``pipeline(images)`` retouches batches at any (fixed)
resolution — proxy downsample, on-device policy rollout, fused Pallas
chain replay.  Accepts uint8 (standard 8-bit images; fastest — 4x less
HBM traffic) or float32 in the linear [0, 1] domain.

Replay strategy (measured on TPU v5e with dependency-serialized slope
timing, tools/bench_truth.py / bench_kernel_probe.py):
- the ``lax.switch`` kernel executes EVERY branch per step under
  Mosaic's lowering (~38-45 ms per 256x512^2 batch regardless of ids);
- the DYNAMIC kernel (``pallas_apply_filter_chain_dynamic``) dispatches
  each image's ids in-kernel via ``pl.when`` on SMEM scalars — real
  control flow, selected-branch-only cost (5.76 ms on the same batch
  after the round-4/5 kernel campaign), ONE compiled program for any
  action mix, and the ids never visit the host, so plan + replay fuse
  into a single jitted dispatch per batch.  **This is the accelerator
  default since round 5** (22.3k img/s/chip streamed, BENCH_r05).
- grouping the batch by trajectory signature and compiling a SWITCHLESS
  static kernel per signature (``GroupedChainRunner``, ``grouped=True``)
  plus the frozen-layout superset replay remains available — it was the
  round-3/4 default and is the comparison baseline (14.0k img/s/chip
  with superset).  Pass ``grouped=False, dynamic=False`` to force the
  single-jit switch-kernel path (e.g. when Mosaic-free jitability
  matters more than throughput).

Options:
- ``bf16=True`` runs the policy rollout in bfloat16 (MXU-native; filter
  replay parameters are cast back to f32 so the full-resolution math is
  unchanged).  Serving uses argmax selection, which is robust to the
  reduced pdf precision.
- masking configs are supported: recorded mask parameters ride along and
  the kernels evaluate the spatial masks in-kernel.

>>> pipe = RetouchPipeline.from_run(cfg)          # or (cfg, state=...)
>>> out_u8 = pipe(np.stack(imgs_u8))              # [B, H, W, 3] uint8
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from exposure_tpu.core.checkpoint import restore_checkpoint
from exposure_tpu.core.rollout import rollout, serve_rollout
from exposure_tpu.core.trainer import build_models, init_train_state
from exposure_tpu.ops.chain import apply_filter_chain
from exposure_tpu.ops.pallas_chain import (
    GroupedChainRunner,
    pallas_apply_filter_chain,
    pallas_apply_filter_chain_dynamic,
)


class RetouchPipeline:

    def __init__(self, cfg, state, use_pallas=None, interpret=False,
                 bf16=False, grouped=None, fast_math=True,
                 fused_set_limit=None, dynamic=None, selected_plan=None,
                 auto_superset=False, auto_record_batches=8,
                 auto_drift_window=8, auto_drift_threshold=1.0 / 16.0):
        self.cfg = cfg
        self.filters, self.policy, _, _ = build_models(cfg)
        self.state = state
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform != 'cpu'
        self.use_pallas = use_pallas
        self.interpret = interpret
        self.bf16 = bf16
        # serving default: polynomial pow/cos + Newton rcp in the
        # kernel (ops/fastmath.py) — error <= ~4e-5, invisible after
        # u8 quantization; pass fast_math=False for the exact kernels
        self.fast_math = fast_math
        # dynamic: ONE jitted program per batch — plan + pl.when-
        # dispatched replay fused (ids never visit the host; no
        # grouping, no compile churn, 1 compiled program per shape).
        # THE DEFAULT since round 5: after the per-filter kernel
        # campaign the dynamic kernel runs at the selected-branch
        # device floor (5.76 ms per 256x512px random-mix batch, 3.7x
        # faster than sync grouped — tools/bench_dyn_probe; the round-4
        # 30.4 ms that parked it predated the campaign), and the
        # streamed pipeline measures 25.0k img/s/chip with the
        # selected-branch-only plan (22.2k with the bank plan) vs the
        # grouped superset's 14.0k (BENCH_r05), ~1% rerun spread —
        # no host syncs, so tunnel erraticism drops out entirely.
        # The grouped/superset machinery remains available for callers
        # that ask for it (grouped=True / auto_superset=True).
        # See ops/pallas_chain.py::_dyn_chain_kernel.
        if dynamic and grouped:
            raise ValueError('dynamic and grouped are exclusive modes')
        if dynamic is None:
            dynamic = use_pallas and not bool(grouped) \
                and not bool(auto_superset)
        self.dynamic = bool(dynamic) and use_pallas
        if grouped is None:
            grouped = use_pallas and not self.dynamic
        self.grouped = bool(grouped) and use_pallas and not self.dynamic
        # selected_plan (round 5): in the dynamic one-program path,
        # advance the 64px PROXY through the selected branch only
        # (core/rollout.py::serve_rollout) instead of the training
        # formulation's 8-candidate bank + one-hot blend — the bank is
        # differentiability machinery serving doesn't need (~2.8 ms of
        # the 10.15 ms bf16 plan per 512-batch, PROFILE.md).  Dynamic
        # mode only; None resolves to the measured default.
        if selected_plan is None:
            selected_plan = self.dynamic
        self.selected_plan = bool(selected_plan) and self.dynamic
        # fused_set_limit: how many distinct SIGNATURE SETS get the
        # one-dispatch fused program before falling back to per-group
        # cached programs (ops/pallas_chain.py GroupedChainRunner).
        # Fixed-mix callers (one repeated batch) want the default; a
        # stream of dropout-varied batches wants 0 — every new set would
        # otherwise be a fresh multi-minute remote compile.
        runner_kw = {}
        if fused_set_limit is not None:
            runner_kw['fused_set_limit'] = fused_set_limit
        self._runner = GroupedChainRunner(self.filters,
                                          interpret=interpret,
                                          fast_math=fast_math,
                                          **runner_kw) \
            if self.grouped else None
        self._fns = {}
        self._plan_fns = {}
        # frozen (signature, bucket) layout for one-dispatch-per-batch
        # replay (GroupedChainRunner.call_superset); recorded by
        # warmup(superset=True) or set directly via freeze_superset()
        self._superset_layout = None
        # AUTO superset (round 4+): record the live traffic's
        # (signature, count) stats for ``auto_record_batches`` batches,
        # freeze the layout from them, then monitor drift — the
        # fraction of rows each batch sends through the merged
        # switch-kernel fallback (signature missing from the layout or
        # overflowing its slot).  When the rolling mean over
        # ``auto_drift_window`` batches exceeds ``auto_drift_threshold``
        # the layout is re-frozen from the stats gathered SINCE the last
        # freeze (i.e. the drifted mix).  A re-freeze costs one fused-
        # program compile, so the threshold trades steady-state
        # throughput against compile churn; the default only fires when
        # >6% of rows pay the every-branch merge kernel.
        self._ss_auto = bool(auto_superset) and self.grouped
        self._ss_record_batches = int(auto_record_batches)
        self._ss_window = int(auto_drift_window)
        self._ss_threshold = float(auto_drift_threshold)
        self._ss_stats = {}
        self._ss_seen = 0
        self._ss_refreezes = 0
        self._ss_drift = collections.deque(maxlen=self._ss_window)
        # re-freeze compile offload: traffic shapes recorded by _replay,
        # a ThreadPoolExecutor warms the new fused program OFF the hot
        # path, and the swap happens once it is compiled (see
        # _ss_refreeze) — an inline freeze would stall the stream for
        # the full remote-compile latency (multi-minute through the
        # tunnel)
        self._ss_shape_info = None
        self._ss_warm_exec = None
        self._ss_warm_pending = None
        self._ss_next_layout = None

    def freeze_superset(self, layout):
        """Freeze a (signature, bucket) slot layout: every subsequent
        grouped replay routes through ONE fused dispatch per batch
        (leftovers through a merged switch call).  ``layout`` is an
        iterable of ``(signature tuple, bucket int)`` — typically the
        per-signature max over a recorded warmup budget."""
        if not self.grouped:
            raise ValueError('superset replay requires grouped mode')
        self._superset_layout = tuple(
            (tuple(int(x) for x in sig), int(size))
            for sig, size in sorted(layout))

    # -- auto superset: record -> freeze -> monitor drift -> re-freeze --
    @staticmethod
    def _sig_counts(idh):
        """Per-signature image counts of a host-side [K, B] ids array
        (identity-masked, same contract as GroupedChainRunner)."""
        cols = np.ascontiguousarray(idh.astype(np.int64, copy=False).T)
        uniq, counts = np.unique(cols, axis=0, return_counts=True)
        return {tuple(int(x) for x in uniq[g]): int(counts[g])
                for g in range(len(uniq))}

    def _ss_uncovered(self, counts, batch):
        """Fraction of this batch's rows the frozen layout cannot place
        (missing signature, or overflow past the slot's bucket) — these
        rows pay the every-branch merged switch kernel."""
        if len(counts) == 1:
            # single-signature batches never touch the layout at all:
            # call_superset early-returns them through the whole-batch
            # static kernel (cached per signature), so no merge-kernel
            # cost is being paid and a re-freeze would buy nothing
            return 0.0
        slot = dict(self._superset_layout)
        miss = sum(n if sig not in slot else max(0, n - slot[sig])
                   for sig, n in counts.items())
        return miss / float(batch)

    def _ss_layout_from_stats(self):
        from exposure_tpu.ops.pallas_chain import _bucket_size
        # one FULL bucket step of headroom above the observed per-sig
        # max (bucket the raw max first, then step — matching
        # warmup(superset=True), which steps from an already-bucketed
        # max): padded slots are DMA-only, overflow pays the
        # every-branch merge kernel, so headroom is the cheap side
        return tuple(sorted(
            (sig, _bucket_size(_bucket_size(n_max) + 1))
            for sig, n_max in self._ss_stats.items()))

    def _ss_apply_layout(self, layout, refreeze=False):
        self.freeze_superset(layout)
        self._ss_stats = {}
        self._ss_seen = 0
        self._ss_drift.clear()
        if refreeze:
            self._ss_refreezes += 1

    def _ss_refreeze(self):
        """The mix drifted away from the frozen layout.  A re-freeze
        means one fused-program compile — taken inline on the hot path
        that is a multi-minute stream stall through a remote tunnel —
        so when the traffic shapes are known the new layout is warmed
        on a side thread (the stream keeps replaying through the OLD
        layout + merge fallback meanwhile) and swapped in by
        ``_ss_observe`` once compiled.  Inline freeze otherwise
        (logic-only callers that never replayed)."""
        layout = self._ss_layout_from_stats()
        if self._ss_shape_info is None or self._runner is None:
            self._ss_apply_layout(layout, refreeze=True)
            return
        img_shape, dtype, num_steps, max_p, mask_p = self._ss_shape_info
        masking = bool(self.cfg.masking)
        if self._ss_warm_exec is None:
            from concurrent.futures import ThreadPoolExecutor
            self._ss_warm_exec = ThreadPoolExecutor(
                1, thread_name_prefix='ss-warm')
        runner = self._runner

        def warm():
            runner.warmup_superset(
                layout, img_shape, dtype, num_steps, max_p,
                masked=masking, mask_p=mask_p)
            return layout

        self._ss_warm_pending = self._ss_warm_exec.submit(warm)

    def _ss_observe(self, idh):
        if (self._ss_warm_pending is not None
                and self._ss_warm_pending.done()):
            # background warm finished: swap the new layout in (its
            # fused program is already compiled — the swap is free)
            fut, self._ss_warm_pending = self._ss_warm_pending, None
            self._ss_apply_layout(fut.result(), refreeze=True)
        counts = self._sig_counts(idh)
        for sig, n in counts.items():
            if self._ss_stats.get(sig, 0) < n:
                self._ss_stats[sig] = n
        self._ss_seen += 1
        if self._superset_layout is None:
            if self._ss_seen >= self._ss_record_batches:
                self._ss_apply_layout(self._ss_layout_from_stats())
            return
        self._ss_drift.append(self._ss_uncovered(counts, idh.shape[1]))
        if (self._ss_warm_pending is None and
                len(self._ss_drift) == self._ss_window and
                sum(self._ss_drift) / self._ss_window >
                self._ss_threshold):
            # re-freeze from the stats gathered since the freeze (>=
            # window batches of the NEW mix), one fused re-compile
            self._ss_refreeze()

    def superset_report(self):
        """Auto-superset state for logging/benchmarks."""
        return {
            'auto': self._ss_auto,
            'frozen_slots': (None if self._superset_layout is None
                             else len(self._superset_layout)),
            'layout': (None if self._superset_layout is None else
                       [[list(sig), size]
                        for sig, size in self._superset_layout]),
            'batches_since_freeze': self._ss_seen,
            'refreezes': self._ss_refreezes,
            'refreeze_warm_pending': self._ss_warm_pending is not None,
            'drift_mean': (round(sum(self._ss_drift) /
                                 len(self._ss_drift), 4)
                           if self._ss_drift else None),
        }

    @classmethod
    def from_run(cls, cfg, model_root='models', ckpt=None, **kwargs):
        filters, policy, critic, value = build_models(cfg)
        state, _ = init_train_state(cfg, policy, critic, value,
                                    cfg.get('seed', 0))
        import os
        if ckpt is not None:
            state, step = restore_checkpoint(
                os.path.join(model_root, cfg.name), state, ckpt)
        else:
            # checkpoint when present, git-tracked serving artifact
            # otherwise (core/artifacts.py) — fresh checkouts keep
            # trained serving without the ~100 MB untracked checkpoints
            from exposure_tpu.core.artifacts import restore_for_serving
            state, step, _ = restore_for_serving(
                cfg.name, state, model_root=model_root)
        return cls(cfg, state, **kwargs)

    # -- trajectory planning (shared by both replay paths) ---------------
    def _plan(self, shape, dtype):
        cfg = self.cfg
        batch = shape[0]
        quantized = dtype == jnp.uint8

        def fn(gen_params, images, key, idx):
            # fold the per-batch counter INSIDE the jit: an eager
            # fold_in would pay one extra dispatch round trip per batch
            # on remote-accelerator topologies
            key = jax.random.fold_in(key, idx)
            if quantized:
                proxy_src = images.astype(jnp.float32) * (1.0 / 255.0)
            else:
                proxy_src = images
            proxy = jax.image.resize(
                proxy_src,
                (batch, cfg.source_img_size, cfg.source_img_size, 3),
                method='linear')
            if self.bf16:
                proxy = proxy.astype(jnp.bfloat16)
                gen_params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), gen_params)
            traj = rollout(self.policy, gen_params, proxy, key, cfg=cfg,
                           filters=self.filters, is_train=0)
            return (traj.filter_ids,
                    traj.params.astype(jnp.float32),
                    traj.mask_params.astype(jnp.float32))

        return jax.jit(fn)

    # -- single-jit paths: dynamic pl.when kernel / switch kernel --------
    def _build(self, shape, dtype, dynamic=False):
        cfg = self.cfg
        quantized = dtype == jnp.uint8
        masking = bool(cfg.masking)

        def fn(gen_params, images, key, idx):
            key = jax.random.fold_in(key, idx)
            if quantized:
                proxy_src = images.astype(jnp.float32) * (1.0 / 255.0)
            else:
                proxy_src = images
            proxy = jax.image.resize(
                proxy_src,
                (shape[0], cfg.source_img_size, cfg.source_img_size, 3),
                method='linear')
            if self.bf16:
                proxy = proxy.astype(jnp.bfloat16)
                gen_params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), gen_params)
            if dynamic and self.selected_plan:
                ids, params, mask_p = serve_rollout(
                    self.policy, gen_params, proxy, key, cfg=cfg,
                    filters=self.filters, fast_math=self.fast_math,
                    interpret=self.interpret)
                return pallas_apply_filter_chain_dynamic(
                    images, ids, params.astype(jnp.float32),
                    self.filters,
                    mask_params=(mask_p.astype(jnp.float32)
                                 if masking else None),
                    interpret=self.interpret,
                    fast_math=self.fast_math)
            traj = rollout(self.policy, gen_params, proxy, key, cfg=cfg,
                           filters=self.filters, is_train=0)
            params = traj.params.astype(jnp.float32)
            mask = traj.mask_params.astype(jnp.float32) if masking \
                else None
            if dynamic:
                return pallas_apply_filter_chain_dynamic(
                    images, traj.filter_ids, params, self.filters,
                    mask_params=mask, interpret=self.interpret,
                    fast_math=self.fast_math)
            if self.use_pallas:
                return pallas_apply_filter_chain(
                    images, traj.filter_ids, params, self.filters,
                    mask_params=mask, interpret=self.interpret,
                    fast_math=self.fast_math)
            out = apply_filter_chain(proxy_src, traj.filter_ids,
                                     params, self.filters,
                                     mask_params=mask)
            if quantized:
                out = jnp.round(jnp.clip(out, 0, 1) * 255).astype(
                    jnp.uint8)
            return out

        return jax.jit(fn)

    def _plan_for(self, images, key, idx=0):
        sig = (images.shape, images.dtype)
        if sig not in self._plan_fns:
            self._plan_fns[sig] = self._plan(images.shape, images.dtype)
        return self._plan_fns[sig](self.state.gen_params, images, key,
                                   idx)

    def _replay(self, images, ids, params, mask, device_out=False):
        masking = bool(self.cfg.masking)
        if self._ss_auto:
            ids = np.asarray(ids)  # one host copy, reused below
            self._ss_shape_info = (
                tuple(images.shape), images.dtype,
                int(params.shape[0]), int(params.shape[-1]),
                int(mask.shape[-1]) if masking else 1)
            self._ss_observe(ids)
        if self._superset_layout is not None:
            out = self._runner.call_superset(
                images, np.asarray(ids), params,
                self._superset_layout,
                mask_params=mask if masking else None)
        else:
            out = self._runner(images, ids, params,
                               mask_params=mask if masking else None)
        return out if device_out else np.asarray(out)

    def _single_jit(self, images, key, idx=0, device_out=False):
        sig = (images.shape, images.dtype, self.dynamic)
        if sig not in self._fns:
            self._fns[sig] = self._build(images.shape, images.dtype,
                                         dynamic=self.dynamic)
        out = self._fns[sig](self.state.gen_params, images, key, idx)
        return out if device_out else np.asarray(out)

    def warmup(self, probe_images, probe_batches=6, seed=0, budget=None,
               superset=False):
        """Precompile serving programs for this pipeline AHEAD of
        traffic (VERDICT r3 item 4: a fresh signature/bucket otherwise
        pays a multi-minute remote compile on first contact).

        ``probe_images``: one representative [B, H, W, 3] batch at the
        exact shape/dtype traffic will use.  For the grouped runner the
        signature budget is RECORDED, not guessed: ``probe_batches``
        plans run through the real policy with distinct dropout keys
        (the signature-set churn source), each plan is grouped exactly
        as ``__call__`` groups it (``GroupedChainRunner.program_plan``),
        and the union of touched (signature, bucket) accumulate
        programs + remainder merge programs is compiled and executed
        once on padded-only rows.  Pass ``budget`` (list of
        ``(signature, bucket)`` pairs, e.g. from a previous run's
        report) to skip probing.

        Returns a report dict (programs compiled, recorded budget)
        suitable for JSON dumping — ``tools/warmup_serving.py`` drives
        this on the real device and measures cold-vs-warm first-batch
        latency.
        """
        import time

        from exposure_tpu.ops.filters import max_filter_parameters

        t0 = time.time()
        images = jnp.asarray(probe_images)
        report = {
            'batch_shape': list(images.shape),
            'dtype': str(jnp.dtype(images.dtype).name),
        }
        if not self.grouped:
            key = jax.random.PRNGKey(seed)
            out = self._single_jit(images, key, idx=0, device_out=True)
            jax.block_until_ready(out)
            report.update(
                kind='dynamic' if self.dynamic else 'switch',
                programs_compiled=1,
                warmup_seconds=round(time.time() - t0, 1))
            return report

        masking = bool(self.cfg.masking)
        sig_budget = set()
        merge_sizes = set()
        singles = {}
        n_fallback = 0
        num_steps = self.cfg.test_steps
        max_p = max_filter_parameters(self.filters)
        mask_p = max(f.get_num_mask_parameters()
                     for f in self.filters) if masking else 1
        if budget is not None:
            sig_budget = {(tuple(sig), int(bucket))
                          for sig, bucket in budget}
        else:
            key = jax.random.PRNGKey(seed)
            for i in range(probe_batches):
                ids, params, mask = self._plan_for(images, key, idx=i)
                idh = np.asarray(ids)
                num_steps, max_p = params.shape[0], params.shape[-1]
                plan = self._runner.program_plan(idh)
                if plan['kind'] == 'groups':
                    sig_budget.update(plan['big'])
                    if plan['merge'] is not None:
                        merge_sizes.add(plan['merge'])
                elif plan['kind'] == 'single':
                    singles[plan['sig']] = plan['single_size']
                else:
                    n_fallback += 1
        if superset:
            # freeze ONE fused program instead of per-(sig, bucket)
            # accumulate programs: per-sig max bucket over the probes
            # becomes the slot size; steady-state replay is then a
            # single dispatch per batch (call_superset docstring)
            from exposure_tpu.ops.pallas_chain import _bucket_size
            per_sig = {}
            for sig, bucket in sig_budget:
                per_sig[sig] = max(per_sig.get(sig, 0), bucket)
            # one bucket step ABOVE the probed max: padded slots cost
            # block DMA only, but overflow rows fall through to the
            # every-branch merge kernel (~0.09 ms/image) — headroom is
            # the cheap side of that trade
            layout = tuple(sorted(
                (sig, _bucket_size(b_max + 1))
                for sig, b_max in per_sig.items()))
            if layout:
                n = self._runner.warmup_superset(
                    layout, images.shape, images.dtype, num_steps,
                    max_p, masked=masking, mask_p=mask_p,
                    merge_sizes=sorted(merge_sizes))
                self.freeze_superset(layout)
            else:  # probes saw only single-signature batches
                n = 0
        else:
            n = self._runner.warmup(
                sorted(sig_budget), images.shape, images.dtype,
                num_steps, max_p, masked=masking, mask_p=mask_p,
                merge_sizes=sorted(merge_sizes))
        for sig, b_sz in sorted(singles.items()):
            fn = self._runner._single_fn(sig, b_sz, images.shape[1:3],
                                         images.dtype, masking)
            zp = jnp.zeros((num_steps, b_sz, max_p), jnp.float32)
            if masking:
                zm = jnp.zeros((num_steps, b_sz, mask_p), jnp.float32)
                jax.block_until_ready(fn(images, zp, zm))
            else:
                jax.block_until_ready(fn(images, zp))
            n += 1
        report.update(
            kind='grouped',
            superset=bool(superset),
            probe_batches=0 if budget is not None else probe_batches,
            budget=sorted([list(sig), int(bucket)]
                          for sig, bucket in sig_budget),
            merge_sizes=sorted(merge_sizes),
            single_signatures=len(singles),
            fallback_batches=n_fallback,
            programs_compiled=int(n),
            warmup_seconds=round(time.time() - t0, 1))
        return report

    def __call__(self, images, seed=0, device_out=False):
        """Retouch a [B, H, W, 3] batch (uint8 or float32 linear).

        ``device_out=True`` returns the device array without the
        host fetch (the caller controls when/what to transfer —
        through a remote-accelerator tunnel the full-batch fetch can
        dominate end-to-end latency by minutes)."""
        images = jnp.asarray(images)
        key = jax.random.PRNGKey(seed)
        if self.grouped:
            ids, params, mask = self._plan_for(images, key)
            return self._replay(images, ids, params, mask,
                                device_out=device_out)
        return self._single_jit(images, key, device_out=device_out)

    def map_batches(self, batches, seed=0, depth=8, device_out=False):
        """Retouch a STREAM of equally-shaped batches, deep-pipelined.

        The grouped replay path needs the planned filter ids ON THE HOST
        (to pick the per-signature kernels), which costs one device->
        host round trip — erratic and expensive on remote-accelerator
        topologies.  This pipeline amortizes AND hides it: policy plans
        run up to ``2*depth`` batches ahead of replay, the ids of
        ``depth`` plans are stacked and cast to uint8 on device (one
        compact fetch — 4x fewer bytes through slow links), and the
        blocking host read runs on a side thread, so replay dispatches
        and further plans keep flowing underneath the fetch.  Per-batch
        host cost drops to Python dispatch overhead only.

        Adds up to ``2*depth`` batches of latency — a throughput
        pipeline, not a low-latency one.  Yields results in order;
        ``device_out=True`` yields device arrays (the caller controls
        when/what to fetch — benchmarks fetch a tiny slice).

        >>> for out in pipe.map_batches(batch_iter()): ...
        """
        if not self.grouped:
            # dynamic (and switch/jnp) modes have NO host syncs: each
            # batch is one async dispatch, the device queue IS the
            # pipeline.  Same per-batch key derivation as the grouped
            # path (base key + in-jit fold_in of the batch index).
            base = jax.random.PRNGKey(seed)
            for i, imgs in enumerate(batches):
                yield self._single_jit(jnp.asarray(imgs), base, idx=i,
                                       device_out=device_out)
            return
        from concurrent.futures import ThreadPoolExecutor
        base = jax.random.PRNGKey(seed)
        it = iter(batches)
        planned = collections.deque()  # (imgs, ids_dev, params, mask)
        pending = collections.deque()  # (ids future, [plan meta] * k)
        ready = collections.deque()    # (imgs, ids_np, params, mask)
        if not hasattr(self, '_stack_fns'):
            self._stack_fns = {}
        i = 0
        exhausted = False
        fetcher = ThreadPoolExecutor(1)

        def flush(k):
            # stack k plans' ids into ONE compact uint8 device array
            # (filter ids are tiny ints); the blocking host read goes to
            # the fetch thread — the main thread keeps dispatching
            if k not in self._stack_fns:
                self._stack_fns[k] = jax.jit(
                    lambda *xs: jnp.stack(xs).astype(jnp.uint8))
            stacked = self._stack_fns[k](
                *[p[1] for p in list(planned)[:k]])
            meta = [planned.popleft() for _ in range(k)]
            pending.append((fetcher.submit(np.asarray, stacked), meta))

        try:
            while True:
                while not exhausted and \
                        len(planned) + sum(len(m) for _, m in pending) \
                        < 2 * depth:
                    try:
                        imgs = jnp.asarray(next(it))
                    except StopIteration:
                        exhausted = True
                        break
                    plan = self._plan_for(imgs, base, idx=i)
                    planned.append((imgs,) + tuple(plan))
                    i += 1
                    if len(planned) >= depth:
                        flush(depth)
                if not ready:
                    if pending:
                        fut, meta = pending.popleft()
                        ids_np = fut.result().astype(np.int32)
                        for j, (imgs, _, params, mask) in \
                                enumerate(meta):
                            ready.append((imgs, ids_np[j], params,
                                          mask))
                    elif planned:
                        flush(len(planned))
                    else:
                        return
                while ready:
                    yield self._replay(*ready.popleft(),
                                       device_out=device_out)
        finally:
            fetcher.shutdown(wait=False)
