"""Serving pipeline tests (CPU; pallas in interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exposure_tpu.core.serving import RetouchPipeline
from exposure_tpu.core.trainer import build_models, init_train_state
from exposure_tpu.utils import load_config


@pytest.fixture(scope='module')
def pipeline():
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    return RetouchPipeline(cfg, state, use_pallas=True, interpret=True)


def test_uint8_roundtrip(pipeline, rng):
    imgs = (rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
    out = pipeline(imgs)
    assert out.shape == imgs.shape
    assert out.dtype == np.uint8


def test_device_out_matches_fetched(pipeline, rng):
    # __call__(device_out=True) returns the device array un-fetched
    # (round 4: warmup_serving latency excludes the tunnel transfer);
    # values must equal the host-fetched path bit-for-bit
    import jax
    imgs = (rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
    dev = pipeline(imgs, seed=7, device_out=True)
    assert isinstance(dev, jax.Array)
    host = pipeline(imgs, seed=7)
    assert isinstance(host, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_float_input(pipeline, rng):
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=False)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32) * 0.5
    out = pipe(imgs)
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()


def test_deterministic_same_seed(pipeline, rng):
    imgs = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    a = pipeline(imgs, seed=3)
    b = pipeline(imgs, seed=3)
    np.testing.assert_array_equal(a, b)


def test_bf16_rollout(rng):
    # bf16 policy rollout: params/proxy cast to bfloat16, replay params
    # cast back to f32 — output stays finite and full precision
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=False, bf16=True)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32) * 0.5
    out = pipe(imgs)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    # greedy selection is usually robust to bf16: outputs should be close
    # to the f32 pipeline wherever the selected chains agree
    pipe32 = RetouchPipeline(cfg, state, use_pallas=False, bf16=False)
    out32 = pipe32(imgs)
    assert np.isfinite(out32).all()


def test_masked_serving(rng):
    # masking config: recorded mask params ride through the fused kernel
    cfg = load_config('test').copy()
    cfg.masking = True
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True)
    imgs = (rng.rand(1, 64, 128, 3) * 255).astype(np.uint8)
    out = pipe(imgs)
    assert out.shape == imgs.shape and out.dtype == np.uint8

    # and the jnp fallback path agrees within a quantization step
    pipe_jnp = RetouchPipeline(cfg, state, use_pallas=False)
    out_jnp = pipe_jnp(imgs)
    diff = np.abs(out.astype(np.int32) - out_jnp.astype(np.int32))
    assert diff.max() <= 1


def test_grouped_serving_matches_single_jit(rng):
    # grouped signature replay (the accelerator default) must reproduce
    # the single-jit switch-kernel pipeline
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(4, 64, 128, 3) * 255).astype(np.uint8)
    pipe_g = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             grouped=True)
    pipe_s = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             grouped=False)
    a = pipe_g(imgs, seed=5)
    b = pipe_s(imgs, seed=5)
    assert a.dtype == np.uint8
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_map_batches_pipelined(rng):
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True)
    batches = [(rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
               for _ in range(3)]
    outs = list(pipe.map_batches(iter(batches), seed=2))
    assert len(outs) == 3
    for b, o in zip(batches, outs):
        assert o.shape == b.shape and o.dtype == np.uint8
    # determinism: same stream twice
    outs2 = list(pipe.map_batches(iter(batches), seed=2))
    for a, c in zip(outs, outs2):
        np.testing.assert_array_equal(a, c)


def test_map_batches_depth_invariant(rng):
    # per-batch RNG depends only on (seed, position), so the output
    # stream must be IDENTICAL whatever the pipeline depth — this is
    # the ordering/scheduling correctness check for the threaded
    # stacked-ids fetch (a misordered pending queue would pair batch
    # i's images with batch j's plan and fail here)
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True)
    batches = [(rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
               for _ in range(7)]
    deep = list(pipe.map_batches(iter(batches), seed=3, depth=3))
    shallow = list(pipe.map_batches(iter(batches), seed=3, depth=1))
    assert len(deep) == len(shallow) == 7
    for a, c in zip(deep, shallow):
        np.testing.assert_array_equal(a, c)


def test_map_batches_early_break(rng):
    # a consumer that stops early must close the generator cleanly
    # (the fetch thread is shut down by the finally block)
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True)
    batches = [(rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
               for _ in range(5)]
    gen = pipe.map_batches(iter(batches), seed=1, depth=2)
    first = next(gen)
    assert first.shape == batches[0].shape
    gen.close()


def test_dynamic_serving_matches_switch_and_grouped(rng):
    # the fused single-dispatch mode (cold-start/compile-budget): plan +
    # pl.when-dispatched replay in ONE program — must reproduce both
    # the switch single-jit pipeline and the grouped runner
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(4, 64, 128, 3) * 255).astype(np.uint8)
    # selected_plan=False: this test checks DISPATCH equivalence given
    # the identical (bank-blend) plan; the selected-only proxy advance
    # may legitimately flip argmax at near-tie pdf margins and is
    # covered by tests/test_serve_rollout.py
    pipe_d = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             dynamic=True, selected_plan=False)
    assert pipe_d.dynamic and not pipe_d.grouped
    pipe_s = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             dynamic=False, grouped=False)
    pipe_g = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             grouped=True)
    assert pipe_g.grouped and not pipe_g.dynamic
    a = pipe_d(imgs, seed=5)
    b = pipe_s(imgs, seed=5)
    assert a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)  # same plan, equivalent replay
    c = pipe_g(imgs, seed=5)
    diff = np.abs(a.astype(np.int32) - c.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    with pytest.raises(ValueError, match='exclusive'):
        RetouchPipeline(cfg, state, dynamic=True, grouped=True)


def test_dynamic_map_batches_matches_grouped_stream(rng):
    # per-batch RNG is (base key, fold_in(i)) in BOTH modes, so the
    # dynamic stream must reproduce the grouped stream batch-for-batch
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    batches = [(rng.rand(2, 64, 128, 3) * 255).astype(np.uint8)
               for _ in range(4)]
    pipe_d = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             dynamic=True, selected_plan=False)
    pipe_g = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                             grouped=True)
    outs_d = list(pipe_d.map_batches(iter(batches), seed=2))
    outs_g = list(pipe_g.map_batches(iter(batches), seed=2))
    assert len(outs_d) == 4
    for a, c in zip(outs_d, outs_g):
        assert a.dtype == np.uint8
        diff = np.abs(a.astype(np.int32) - c.astype(np.int32))
        assert diff.max() <= 1, diff.max()
    # device_out yields device arrays (the caller controls fetching)
    dev = list(pipe_d.map_batches(iter(batches[:1]), seed=2,
                                  device_out=True))
    assert isinstance(dev[0], jax.Array)


def test_warmup_precompiles_serving_programs(rng):
    # VERDICT r4 item: warmup records the (signature, bucket) budget
    # from probe plans and precompiles it — live traffic with the SAME
    # dropout keys must then touch no new replay program.
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(16, 64, 128, 3) * 255).astype(np.uint8)

    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True, fused_set_limit=0)
    rep = pipe.warmup(imgs, probe_batches=2, seed=0)
    assert rep['kind'] == 'grouped'
    assert rep['programs_compiled'] >= 1
    n_before = len(pipe._runner._fns)
    # serve with a key the probe DID cover (idx folding: probe i used
    # fold_in(PRNGKey(0), i); __call__ uses fold_in(PRNGKey(seed), 0))
    ids, params, mask = pipe._plan_for(jnp.asarray(imgs),
                                       jax.random.PRNGKey(0), idx=1)
    out = pipe._replay(jnp.asarray(imgs), ids, params, mask)
    assert out.shape == imgs.shape
    assert len(pipe._runner._fns) == n_before, (
        'warmed traffic compiled new programs: %s' %
        [k for k in pipe._runner._fns if k not in range(n_before)])
    # warmed replay must be IDENTICAL to an unwarmed pipeline's output
    pipe2 = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                            grouped=True, fused_set_limit=0)
    ids2, params2, mask2 = pipe2._plan_for(jnp.asarray(imgs),
                                           jax.random.PRNGKey(0), idx=1)
    out2 = pipe2._replay(jnp.asarray(imgs), ids2, params2, mask2)
    np.testing.assert_array_equal(out, out2)


def test_warmup_explicit_budget_and_modes(rng):
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(4, 64, 64, 3) * 255).astype(np.uint8)

    # explicit budget path: no probing, exactly the declared programs
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True, fused_set_limit=0)
    k = cfg.test_steps
    sig = tuple([0] * k)
    rep = pipe.warmup(imgs, budget=[(sig, 8)])
    assert rep['probe_batches'] == 0
    # creates + accumulate variants for the one (sig, bucket) pair
    assert rep['programs_compiled'] == 2
    # non-grouped modes: one program.  grouped=False now resolves to
    # the DYNAMIC one-program path (the round-5 accelerator default);
    # the switch kernel needs dynamic=False too.
    pipe_d = RetouchPipeline(cfg, state, use_pallas=True,
                             interpret=True, grouped=False)
    assert pipe_d.dynamic
    rep_d = pipe_d.warmup(imgs)
    assert rep_d['kind'] == 'dynamic'
    assert rep_d['programs_compiled'] == 1
    pipe_s = RetouchPipeline(cfg, state, use_pallas=True,
                             interpret=True, grouped=False,
                             dynamic=False)
    rep_s = pipe_s.warmup(imgs)
    assert rep_s['kind'] == 'switch'
    assert rep_s['programs_compiled'] == 1


def test_auto_superset_record_freeze_drift_logic():
    # auto-superset state machine (round 4+), driven through
    # _ss_observe with hand-built id arrays (no replay/compile):
    # record N batches -> freeze with +1-bucket headroom -> drift past
    # the threshold over a full window -> re-freeze on the new mix.
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True, fused_set_limit=0,
                           auto_superset=True, auto_record_batches=2,
                           auto_drift_window=3,
                           auto_drift_threshold=0.25)
    assert pipe._ss_auto
    k, b = cfg.test_steps, 16
    ids_a = np.zeros((k, b), np.int32)
    ids_a[:, 10:] = 1  # two signatures: 10 rows sig-A, 6 rows sig-B
    pipe._ss_observe(ids_a)
    assert pipe._superset_layout is None  # still recording
    pipe._ss_observe(ids_a)
    layout = dict(pipe._superset_layout)  # frozen after 2 batches
    sig_a = tuple([0] * k)
    sig_b = tuple([1] * k)
    # buckets step one FULL bucket above the observed max (same
    # headroom trade as warmup(superset=True)): 10 -> 16, 6 -> 12
    assert layout == {sig_a: 16, sig_b: 12}
    # same-mix traffic: no drift, no refreeze
    for _ in range(4):
        pipe._ss_observe(ids_a)
    assert pipe._ss_refreezes == 0
    assert dict(pipe._superset_layout) == layout
    # a SINGLE-signature batch with an unknown signature is NOT drift:
    # call_superset routes it through the whole-batch static kernel,
    # never the merge fallback, so no re-freeze should fire on it
    ids_single = np.full((k, b), 3, np.int32)
    for _ in range(4):
        pipe._ss_observe(ids_single)
    assert pipe._ss_refreezes == 0
    # drifted MULTI-signature mix: two new signatures own the batch
    ids_c = np.full((k, b), 2, np.int32)
    ids_c[:, 10:] = 4
    for _ in range(3):
        pipe._ss_observe(ids_c)
    assert pipe._ss_refreezes == 1
    new_layout = dict(pipe._superset_layout)
    sig_c = tuple([2] * k)
    assert sig_c in new_layout and new_layout[sig_c] >= 10
    rep = pipe.superset_report()
    assert rep['auto'] and rep['refreezes'] == 1
    assert rep['frozen_slots'] == len(new_layout)


def test_auto_superset_stream_matches_grouped(rng):
    # integration: an auto-superset pipeline must freeze mid-stream and
    # keep producing outputs IDENTICAL to the plain grouped pipeline
    # on the same plans (the freeze changes routing, never values)
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(16, 64, 128, 3) * 255).astype(np.uint8)
    auto = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True, fused_set_limit=0,
                           auto_superset=True, auto_record_batches=2)
    plain = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                            grouped=True, fused_set_limit=0)
    batches = [imgs] * 4
    outs_a = list(auto.map_batches(iter(batches), seed=0, depth=2))
    outs_p = list(plain.map_batches(iter(batches), seed=0, depth=2))
    assert auto._superset_layout is not None  # froze mid-stream
    assert auto._ss_refreezes == 0
    for a, p in zip(outs_a, outs_p):
        np.testing.assert_array_equal(a, p)


def test_warmup_superset_one_dispatch_replay(rng):
    # superset mode (round 4): warmup freezes a (sig, bucket) layout;
    # subsequent replays route through call_superset and must be
    # bit-identical to the per-(sig,bucket) accumulate path
    cfg = load_config('test')
    filters, policy, critic, value = build_models(cfg)
    state, _ = init_train_state(cfg, policy, critic, value, 0)
    imgs = (rng.rand(16, 64, 128, 3) * 255).astype(np.uint8)

    pipe = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                           grouped=True, fused_set_limit=0)
    rep = pipe.warmup(imgs, probe_batches=2, seed=0, superset=True)
    assert rep['superset'] is True
    ids, params, mask = pipe._plan_for(jnp.asarray(imgs),
                                       jax.random.PRNGKey(0), idx=1)
    if pipe._superset_layout is None:
        # tiny test policy planned single-signature probes: freeze a
        # layout by hand so the multi-sig routing path still runs —
        # split the planned batch into two synthetic signatures
        idh = np.asarray(ids).copy()
        nf = len(pipe.filters)
        idh[0, 8:] = (idh[0, 8:] + 1) % nf
        ids = jnp.asarray(idh)
        sig_a = tuple(int(x) for x in idh[:, 0])
        sig_b = tuple(int(x) for x in idh[:, 8])
        pipe.freeze_superset([(sig_a, 8), (sig_b, 8)])
    out = pipe._replay(jnp.asarray(imgs), ids, params, mask)
    assert out.shape == imgs.shape
    n_before = len(pipe._runner._fns)
    out_again = pipe._replay(jnp.asarray(imgs), ids, params, mask)
    np.testing.assert_array_equal(out, out_again)
    assert len(pipe._runner._fns) == n_before, (
        'repeat superset traffic compiled new programs')
    # equality vs the accumulate-path pipeline on the same plan
    pipe2 = RetouchPipeline(cfg, state, use_pallas=True, interpret=True,
                            grouped=True, fused_set_limit=0)
    out2 = pipe2._replay(jnp.asarray(imgs), ids, params, mask)
    np.testing.assert_array_equal(out, out2)
