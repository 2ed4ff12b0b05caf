"""Trainer component tests: events, hooks, solver, checkpointer, evaluators."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from focoos_tpu.trainer.events import EventStorage, get_event_storage
from focoos_tpu.trainer.solver import build_schedule, leaf_hyperparams
from focoos_tpu.ports import TrainerArgs


def test_event_storage_scalars_and_smoothing():
    with EventStorage(0) as storage:
        for i in range(30):
            storage.put_scalar("loss", float(30 - i))
            storage.step()
        assert get_event_storage() is storage
        med = storage.history("loss").median(20)
        assert 1 <= med <= 30
        latest = storage.latest()["loss"]
        assert latest[0] == 1.0


def test_schedules():
    s = build_schedule(
        "MULTISTEP", 1.0, 100,
        {"milestones": [0.5], "gamma": 0.1, "warmup_iters": 10, "warmup_factor": 0.001},
    )
    assert float(s(jnp.asarray(0))) < 0.2  # warmup
    assert abs(float(s(jnp.asarray(20))) - 1.0) < 1e-6
    assert abs(float(s(jnp.asarray(60))) - 0.1) < 1e-6
    # default MULTISTEP = constant LR, NO milestones (reference
    # WarmupMultiStepLR defaults milestones=[], lr_scheduler.py:78 — a
    # [0.5,0.75] default silently under-trained the back half of every run)
    s0 = build_schedule("MULTISTEP", 1.0, 100, None)
    for it in (0, 49, 50, 75, 99):
        assert abs(float(s0(jnp.asarray(it))) - 1.0) < 1e-9, it
    c = build_schedule("COSINE", 1.0, 100, None)
    assert float(c(jnp.asarray(0))) == 1.0
    assert float(c(jnp.asarray(100))) < 1e-6
    p = build_schedule("POLY", 1.0, 100, None)
    assert 0.0 <= float(p(jnp.asarray(99))) < 0.05


def test_leaf_hyperparams_multipliers():
    params = {
        "backbone": {"conv": {"kernel": jnp.zeros((3, 3))}},
        "pixel_decoder": {"lin": {"kernel": jnp.zeros((3, 3))}},
        "head": {"classifier": {"kernel": jnp.zeros((3, 3))}, "misc": {"kernel": jnp.zeros((3, 3))}},
        "norm_layer": {"bn": {"scale": jnp.zeros((3,))}},
    }
    lr, wd = leaf_hyperparams(params, base_wd=0.01, wd_norm=0.0, backbone_multiplier=0.1,
                              decoder_multiplier=0.5, head_multiplier=2.0)
    # reference semantics (verified update-for-update vs torch optimizers in
    # tools/parity_loss.py::optimizer_parity): the torch backbone is NESTED
    # inside pixel_decoder, so backbone_mult and decoder_mult STACK
    assert float(lr["backbone"]["conv"]["kernel"]) == pytest.approx(0.1 * 0.5)
    assert float(lr["pixel_decoder"]["lin"]["kernel"]) == pytest.approx(0.5)
    assert float(lr["head"]["misc"]["kernel"]) == pytest.approx(2.0)
    assert float(lr["head"]["classifier"]["kernel"]) == pytest.approx(1.0)  # classifier excluded
    assert float(wd["norm_layer"]["bn"]["scale"]) == pytest.approx(0.0)
    # structural norm detection: a scale-bearing param dict is a norm layer
    # regardless of its name (reference exempts by module type)
    params2 = {"predictor": {"enc_output_1": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))}}}
    _, wd2 = leaf_hyperparams(params2, base_wd=0.01, wd_norm=0.0)
    assert float(wd2["predictor"]["enc_output_1"]["scale"]) == pytest.approx(0.0)
    assert float(wd2["predictor"]["enc_output_1"]["bias"]) == pytest.approx(0.0)


def test_checkpointer_roundtrip(tmp_path):
    from focoos_tpu.trainer.checkpointer import Checkpointer

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    ck = Checkpointer(state, str(tmp_path))
    ck.save("model_0000001", state, iteration=1)
    assert ck.has_checkpoint()
    loaded, extra = ck.load(ck.get_checkpoint_file())
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert int(extra["iteration"]) == 1


def test_semseg_evaluator_perfect_prediction():
    from focoos_tpu.trainer.evaluation import SemSegEvaluator
    from focoos_tpu.ports import DatasetEntry

    ev = SemSegEvaluator(num_classes=3)
    gt = np.random.default_rng(0).integers(0, 3, (32, 32)).astype(np.uint8)
    entry = DatasetEntry(sem_seg=gt)
    ev.process([entry], [{"sem_seg": gt}])
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] == pytest.approx(100.0)
    assert res["pACC"] == pytest.approx(100.0)


def test_semseg_evaluator_ignore_pixels_excluded_from_union():
    """Ignore-label gt pixels must not enter the IoU union even when the model
    predicts real classes there (reference sem_seg_evaluation.py:135-140 trims
    conf_matrix[:-1, :-1]). Expected values computed by hand from the reference
    formula."""
    from focoos_tpu.trainer.evaluation import SemSegEvaluator
    from focoos_tpu.ports import DatasetEntry

    gt = np.full(16, 255, np.uint8)
    pred = np.zeros(16, np.int64)
    # class-0 gt: 6 correct, 2 predicted as 1
    gt[:8] = 0
    pred[:6] = 0
    pred[6:8] = 1
    # class-1 gt: 3 correct, 1 predicted as 0
    gt[8:12] = 1
    pred[8:11] = 1
    pred[11] = 0
    # 4 ignore pixels, all predicted class 0 — must not affect the metrics
    pred[12:] = 0
    gt, pred = gt.reshape(4, 4), pred.reshape(4, 4)

    ev = SemSegEvaluator(num_classes=2)
    ev.process([DatasetEntry(sem_seg=gt)], [{"sem_seg": pred}])
    res = ev.evaluate()["sem_seg"]
    # conf = [[6,2],[1,3]]: IoU = [6/9, 3/6] -> mIoU 58.333; pACC 9/12; mACC (6/8+3/4)/2
    assert res["mIoU"] == pytest.approx(100 * (6 / 9 + 3 / 6) / 2, abs=1e-6)
    assert res["pACC"] == pytest.approx(75.0, abs=1e-6)
    assert res["mACC"] == pytest.approx(75.0, abs=1e-6)
    fw = 100 * (8 * 6 / 9 + 4 * 3 / 6) / 12
    assert res["fwIoU"] == pytest.approx(fw, abs=1e-6)


def test_detection_evaluator_perfect_and_empty():
    from focoos_tpu.structures import Boxes, Instances
    from focoos_tpu.trainer.evaluation import DetectionEvaluator
    from focoos_tpu.ports import DatasetEntry

    ev = DetectionEvaluator(class_names=["a", "b"])
    boxes = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    gt = Instances((128, 128), boxes=Boxes(boxes), classes=np.array([0, 1]))
    pred = Instances((128, 128), boxes=Boxes(boxes), classes=np.array([0, 1]), scores=np.array([0.9, 0.8]))
    ev.process([DatasetEntry(instances=gt, height=128, width=128)], [{"instances": pred}])
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)


def test_detection_evaluator_crowd_gt_is_ignore_region():
    """A det overlapping only a crowd GT must be IGNORED (COCO convention),
    not counted as an FP — plumbing check for entry.instances.iscrowd →
    add_image(gt_crowd=...) (ADVICE r4: crowds were dropped before the
    evaluator, deflating AP on crowd-annotated datasets)."""
    from focoos_tpu.structures import Boxes, Instances
    from focoos_tpu.trainer.evaluation import DetectionEvaluator
    from focoos_tpu.ports import DatasetEntry

    gt_boxes = np.array([[10, 10, 50, 50], [60, 60, 120, 120]], np.float32)
    gt = Instances((128, 128), boxes=Boxes(gt_boxes), classes=np.array([0, 0]),
                   iscrowd=np.array([0, 1]))
    # det 1 matches the real GT; det 2 sits inside the crowd region only and
    # outscores it (so if counted as FP it caps precision at every recall)
    dt_boxes = np.array([[10, 10, 50, 50], [70, 70, 110, 110]], np.float32)
    pred = Instances((128, 128), boxes=Boxes(dt_boxes), classes=np.array([0, 0]),
                     scores=np.array([0.9, 0.95]))
    ev = DetectionEvaluator(class_names=["a"])
    ev.process([DatasetEntry(instances=gt, height=128, width=128)], [{"instances": pred}])
    assert ev.evaluate()["bbox"]["AP"] == pytest.approx(100.0)

    # same scene with the crowd flag stripped: det 2 becomes a real FP
    gt2 = Instances((128, 128), boxes=Boxes(gt_boxes[:1]), classes=np.array([0]))
    ev2 = DetectionEvaluator(class_names=["a"])
    ev2.process([DatasetEntry(instances=gt2, height=128, width=128)], [{"instances": pred}])
    assert ev2.evaluate()["bbox"]["AP"] < 100.0


def test_classification_evaluator():
    from focoos_tpu.trainer.evaluation import ClassificationEvaluator
    from focoos_tpu.ports import DatasetEntry

    ev = ClassificationEvaluator(num_classes=3)
    ev.process(
        [DatasetEntry(label=0), DatasetEntry(label=1)],
        [{"logits": np.array([0.9, 0.1, 0.1])}, {"logits": np.array([0.2, 0.8, 0.3])}],
    )
    res = ev.evaluate()["classification"]
    assert res["f1"] == pytest.approx(100.0)


def test_panoptic_evaluator_pq():
    from focoos_tpu.trainer.evaluation import PanopticEvaluator

    ld = 1000
    gt = np.zeros((10, 10), np.int64)
    gt[:5, :5] = 0 * ld + 1   # thing (class 0), 25 px
    gt[5:, :] = 1 * ld + 1    # stuff (class 1), 50 px
    pred = np.zeros((10, 10), np.int64)
    pred[:5, :4] = 0 * ld + 7  # IoU 20/25 = 0.8
    pred[5:, :] = 1 * ld + 3   # IoU 1.0

    ev = PanopticEvaluator(num_classes=2, class_names=["car", "sky"], thing_ids=[0])
    ev.process([{"pan_seg": gt}], [{"panoptic_seg": (pred, None)}])
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == pytest.approx(90.0)
    assert res["PQ_th"] == pytest.approx(80.0)
    assert res["PQ_st"] == pytest.approx(100.0)

    # spurious segment fully on GT VOID is not an FP (panopticapi rule)
    pred2 = pred.copy()
    pred2[:3, 6:9] = 0 * ld + 9
    ev2 = PanopticEvaluator(2, thing_ids=[0])
    ev2.process([{"pan_seg": gt}], [{"panoptic_seg": (pred2, None)}])
    assert ev2.evaluate()["panoptic_seg"]["PQ"] == pytest.approx(90.0)

    # missed thing -> FN halves PQ
    pred3 = np.zeros((10, 10), np.int64)
    pred3[5:, :] = 1 * ld + 3
    ev3 = PanopticEvaluator(2, thing_ids=[0])
    ev3.process([{"pan_seg": gt}], [{"panoptic_seg": (pred3, None)}])
    assert ev3.evaluate()["panoptic_seg"]["PQ"] == pytest.approx(50.0)


def test_panoptic_inference_to_evaluator_loop():
    """MF panoptic_inference output feeds PanopticEvaluator: self-eval PQ=100,
    stuff fragments of one class merge into one segment."""
    from focoos_tpu.models.fai_mf.config import MaskFormerConfig
    from focoos_tpu.models.fai_mf.processor import MaskFormerProcessor
    from focoos_tpu.trainer.evaluation import PanopticEvaluator

    p = MaskFormerProcessor(MaskFormerConfig(num_classes=3), image_size=64)
    H = W = 8
    cls_probs = np.array([[0.95, 0.03, 0.02], [0.05, 0.05, 0.9], [0.4, 0.3, 0.3]])
    masks = np.zeros((3, H, W), np.float32)
    masks[0, :, :4] = 0.9
    masks[1, :, 4:] = 0.9
    masks[2] = 0.6
    pan, segs = p.panoptic_inference(cls_probs, masks, thing_ids={0})
    assert len(segs) == 2
    assert (pan[:, :4] == 1).all() and (pan[:, 4:] == 2001).all()

    cls2 = np.array([[0.05, 0.05, 0.9], [0.05, 0.05, 0.9]])
    m2 = np.zeros((2, H, W), np.float32)
    m2[0, :4] = 0.9
    m2[1, 4:] = 0.9
    _, segs2 = p.panoptic_inference(cls2, m2, thing_ids={0})
    assert len(segs2) == 1 and segs2[0]["area"] == H * W

    ev = PanopticEvaluator(num_classes=3, thing_ids=[0])
    ev.process([{"pan_seg": pan}], [{"panoptic_seg": (pan, segs)}])
    assert ev.evaluate()["panoptic_seg"]["PQ"] == pytest.approx(100.0)


def test_multi_train_step_matches_iterated_single_steps():
    """build_multi_train_step(K) produces the same final params as K single
    steps with the same per-step rngs and batches."""
    import jax
    import jax.numpy as jnp
    import optax

    from focoos_tpu.trainer.train_step import (
        build_multi_train_step,
        build_train_step,
        create_train_state,
    )

    def loss_fn(variables, batch, rng):
        w = variables["params"]["w"]
        x, y = batch
        pred = x @ w
        loss = jnp.mean((pred - y) ** 2)
        return loss, ({"l": loss}, {"batch_stats": variables["batch_stats"]})

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.ones((3, 1))}, "batch_stats": {}}
    k = jax.random.PRNGKey(0)
    xs = jax.random.normal(k, (4, 8, 3))
    ys = jax.random.normal(jax.random.fold_in(k, 1), (4, 8, 1))

    single = build_train_step(loss_fn, tx, donate=False)
    s1 = create_train_state(dict(variables), tx)
    rngs = jax.random.split(jax.random.PRNGKey(7), 4)
    for i in range(4):
        s1, _ = single(s1, (xs[i], ys[i]), rngs[i])

    multi = build_multi_train_step(loss_fn, tx, steps_per_call=4, donate=False)
    s2 = create_train_state(dict(variables), tx)
    # multi splits its own rngs; loss here ignores rng so streams don't matter
    s2, metrics = multi(s2, (xs, ys), jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(s1.params["w"]), np.asarray(s2.params["w"]), rtol=1e-6)
    assert int(s2.step) == 4
    assert metrics["l"].shape == ()  # averaged over the K steps


def test_ema_update_math():
    """EMA params follow e*d + p*(1-d) with the warmup-ramped decay."""
    import jax
    import jax.numpy as jnp
    import optax

    from focoos_tpu.trainer.solver import ema_decay_schedule
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state

    def loss_fn(variables, batch, rng):
        w = variables["params"]["w"]
        return jnp.sum(w**2), ({}, {"batch_stats": {}})

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.full((3,), 2.0)}, "batch_stats": {}}
    decay_fn = ema_decay_schedule(0.9, warmup=0)
    step = build_train_step(loss_fn, tx, ema_decay_fn=decay_fn, donate=False)
    s = create_train_state(dict(variables), tx, ema_enabled=True)
    np.testing.assert_allclose(np.asarray(s.ema_params["w"]), 2.0)

    s1, _ = step(s, None, jax.random.PRNGKey(0))
    # grad = 2w = 4 -> w1 = 2 - 0.4 = 1.6 ; ema = 2*d + 1.6*(1-d)
    d = float(decay_fn(jnp.asarray(0)))
    np.testing.assert_allclose(np.asarray(s1.params["w"]), 1.6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.ema_params["w"]), 2.0 * d + 1.6 * (1 - d), rtol=1e-6)


def test_period_hit_with_multi_step_stride():
    """Hook periods not aligned with steps_per_call must still fire whenever a
    period boundary falls inside the K-step window (ADVICE r1 medium)."""
    from focoos_tpu.trainer.hooks import _period_hit

    class T:
        pass

    t = T()
    t.steps_per_call = 4
    fired = []
    for i in range(0, 40, 4):
        t.iter = i
        if _period_hit(t, 10):
            fired.append(i)
    # multiples of 10 land in (8,12], (16,20], (28,32], (36,40]
    assert fired == [8, 16, 28, 36]

    # K=1 reduces exactly to (iter+1) % period == 0
    t.steps_per_call = 1
    got = []
    for i in range(10):
        t.iter = i
        got.append(_period_hit(t, 5))
    assert got == [(i + 1) % 5 == 0 for i in range(10)]


def test_periodic_checkpointer_stride(tmp_path):
    """PeriodicCheckpointerMixin with stride=K saves on boundaries inside the
    window and writes model_final when the call completes max_iter."""
    from focoos_tpu.trainer.checkpointer import Checkpointer, PeriodicCheckpointerMixin

    state = {"params": {"w": jnp.zeros(2)}}
    ck = Checkpointer(state, str(tmp_path))
    pc = PeriodicCheckpointerMixin(ck, period=10, max_iter=12, max_to_keep=5)
    pc.step(4, state, stride=4)   # (4,8] — no multiple of 10
    assert not os.path.isdir(tmp_path / "model_0000004")
    pc.step(8, state, stride=4)   # (8,12] contains 10 AND completes max_iter=12
    # the state reflects completed iterations 8..11, so the name/iteration
    # field record the LAST completed iteration (resume replays nothing —
    # ADVICE r2 medium)
    assert os.path.isdir(tmp_path / "model_0000011")
    assert os.path.isdir(tmp_path / "model_final")
    _, extra = ck.load("model_0000011")
    assert int(extra["iteration"]) == 11
    _, extra_f = ck.load("model_final")
    assert int(extra_f["iteration"]) == 11


def test_early_stopping_hook_triggers():
    from focoos_tpu.trainer.events import EventStorage
    from focoos_tpu.trainer.hooks import EarlyStopException, EarlyStoppingHook

    class FakeTrainer:
        iter = 0
        max_iter = 100

    h = EarlyStoppingHook(patience=2, metric="bbox/AP")
    h.trainer = FakeTrainer()
    with EventStorage(0) as storage:
        with pytest.raises(EarlyStopException):
            for it, val in enumerate([10.0, 10.0, 9.0, 8.0, 7.0]):
                storage.iter = it
                FakeTrainer.iter = it
                storage.put_scalar("bbox/AP", val, smoothing_hint=False)
                h.after_step()


def test_sharded_train_step_matches_single_device():
    """build_train_step over the 8-device conftest mesh produces the same
    params/batch_stats/metrics as the unmeshed step — data-parallel gradient
    psum + global-batch BN are inserted by GSPMD, so sharded and single-device
    training must agree to float tolerance (VERDICT r1 weak #2; reference
    analog: dist.py:138 DDP + SyncBatchNorm trainer.py:334)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from focoos_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from focoos_tpu.trainer.train_step import build_train_step, create_train_state

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(4)(x)

    module = Tiny()
    xk = jax.random.PRNGKey(0)
    images = jax.random.normal(xk, (16, 8, 8, 3))
    labels = jax.random.randint(jax.random.fold_in(xk, 1), (16,), 0, 4)
    variables = module.init(jax.random.PRNGKey(2), images[:1], train=True)

    def loss_fn(vars_, batch, rng):
        x, y = batch
        logits, new_state = module.apply(vars_, x, train=True, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, ({"ce": loss}, new_state)

    tx = optax.sgd(0.1)

    # single device
    s1 = create_train_state(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, tx
    )
    step1 = build_train_step(loss_fn, tx, donate=False)
    m1 = None
    for i in range(2):
        s1, m1 = step1(s1, (images, labels), jax.random.PRNGKey(i))

    # 8-device data mesh
    mesh = make_mesh((8,), devices=jax.devices()[:8])
    s2 = create_train_state(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, tx
    )
    s2 = replicate(s2, mesh)
    step8 = build_train_step(loss_fn, tx, mesh=mesh, donate=False)
    m2 = None
    for i in range(2):
        batch = shard_batch((images, labels), mesh)
        s2, m2 = step8(s2, batch, jax.random.PRNGKey(i))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        s1.params, jax.device_get(s2.params),
    )
    # BN running stats computed over the GLOBAL batch (SyncBN semantics)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        s1.batch_stats, jax.device_get(s2.batch_stats),
    )
    assert float(m1["total_loss"]) == pytest.approx(float(m2["total_loss"]), rel=1e-5)
    assert float(m1["grad_norm"]) == pytest.approx(float(m2["grad_norm"]), rel=1e-4)


def test_evaluator_multihost_merge_seam():
    """Splitting images across two evaluator instances and merging their
    gathered states must reproduce the single-evaluator result exactly
    (reference: comm.all_gather in sem_seg_evaluation.py; VERDICT r1 #8)."""
    from focoos_tpu.structures import Boxes, Instances
    from focoos_tpu.trainer.evaluation import DetectionEvaluator, SemSegEvaluator
    from focoos_tpu.ports import DatasetEntry

    rng = np.random.default_rng(0)

    def det_sample(seed):
        r = np.random.default_rng(seed)
        n = int(r.integers(1, 6))
        xy = r.uniform(0, 80, (n, 2))
        wh = r.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        cls = r.integers(0, 3, n)
        gt = Instances((128, 128), boxes=Boxes(boxes), classes=cls)
        jitter = boxes + r.normal(0, 3, boxes.shape).astype(np.float32)
        pred = Instances((128, 128), boxes=Boxes(jitter), classes=cls,
                         scores=r.uniform(0.2, 1, n))
        return DatasetEntry(instances=gt, height=128, width=128), {"instances": pred}

    samples = [det_sample(i) for i in range(10)]

    single = DetectionEvaluator(class_names=["a", "b", "c"])
    for inp, out in samples:
        single.process([inp], [out])
    want = single.evaluate()["bbox"]

    host0 = DetectionEvaluator(class_names=["a", "b", "c"])
    host1 = DetectionEvaluator(class_names=["a", "b", "c"])
    for inp, out in samples[:5]:
        host0.process([inp], [out])
    for inp, out in samples[5:]:
        host1.process([inp], [out])
    states = [host0.state_for_gather(), host1.state_for_gather()]
    merged = DetectionEvaluator(class_names=["a", "b", "c"])
    merged.load_gathered_states(states)
    got = merged.evaluate()["bbox"]
    for k in want:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-12), k

    # semseg confusion-matrix merge
    gts = [rng.integers(0, 3, (16, 16)).astype(np.uint8) for _ in range(4)]
    preds = [rng.integers(0, 3, (16, 16)).astype(np.int64) for _ in range(4)]
    sev = SemSegEvaluator(num_classes=3)
    for g, p in zip(gts, preds):
        sev.process([DatasetEntry(sem_seg=g)], [{"sem_seg": p}])
    want_s = sev.evaluate()["sem_seg"]
    h0, h1 = SemSegEvaluator(3), SemSegEvaluator(3)
    for g, p in zip(gts[:2], preds[:2]):
        h0.process([DatasetEntry(sem_seg=g)], [{"sem_seg": p}])
    for g, p in zip(gts[2:], preds[2:]):
        h1.process([DatasetEntry(sem_seg=g)], [{"sem_seg": p}])
    m = SemSegEvaluator(3)
    m.load_gathered_states([h0.state_for_gather(), h1.state_for_gather()])
    got_s = m.evaluate()["sem_seg"]
    for k in want_s:
        assert got_s[k] == pytest.approx(want_s[k], abs=1e-12), k


def test_shard_indices_exact_partition():
    from focoos_tpu.trainer.evaluation import _shard_indices

    for n in (0, 1, 7, 16, 23):
        for world in (1, 2, 3, 8):
            all_idx = []
            for r in range(world):
                all_idx += _shard_indices(n, r, world)
            assert sorted(all_idx) == list(range(n)), (n, world)


def test_multi_step_train_on_mesh_matches_single_device():
    """steps_per_call>1 combined with the 8-device data mesh (scan over K
    sharded batches) must match unmeshed iterated steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from focoos_tpu.parallel.mesh import make_mesh, replicate
    from focoos_tpu.trainer.train_step import (
        build_multi_train_step,
        build_train_step,
        create_train_state,
    )

    def loss_fn(variables, batch, rng):
        w = variables["params"]["w"]
        x, y = batch
        loss = jnp.mean((x @ w - y) ** 2)
        return loss, ({"l": loss}, {"batch_stats": variables["batch_stats"]})

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.ones((3, 1))}, "batch_stats": {}}
    k = jax.random.PRNGKey(0)
    K, B = 3, 16
    xs = jax.random.normal(k, (K, B, 3))
    ys = jax.random.normal(jax.random.fold_in(k, 1), (K, B, 1))

    single = build_train_step(loss_fn, tx, donate=False)
    s1 = create_train_state(dict(variables), tx)
    for i in range(K):
        s1, _ = single(s1, (xs[i], ys[i]), jax.random.fold_in(jax.random.PRNGKey(7), i))

    mesh = make_mesh((8,), devices=jax.devices()[:8])
    multi = build_multi_train_step(loss_fn, tx, steps_per_call=K, mesh=mesh, donate=False)
    s2 = replicate(create_train_state(dict(variables), tx), mesh)
    s2, metrics = multi(s2, (xs, ys), jax.random.PRNGKey(7))

    np.testing.assert_allclose(np.asarray(s1.params["w"]), np.asarray(jax.device_get(s2.params["w"])),
                               rtol=2e-5)
    assert int(jax.device_get(s2.step)) == K


def test_ragged_kgroup_without_fallback_is_a_hard_error():
    """steps_per_call>1 with ragged micro-batch shapes and no single-step
    fallback must refuse to run: zero-padding across micro-batches would
    contaminate BN batch statistics (VERDICT r3 weak #6 — error, not warning)."""
    import pytest

    from focoos_tpu.trainer.trainer import TrainerLoop

    def step_fn(state, batch, rng):
        return state, {"total_loss": jnp.asarray(0.0)}

    batches = iter([{"img": jnp.ones((2, 4, 4, 3))}, {"img": jnp.ones((2, 8, 8, 3))}])
    loop = TrainerLoop(step_fn, state={}, data_iter=batches, max_iter=2, steps_per_call=2)
    with pytest.raises(ValueError, match="ragged micro-batch shapes"):
        loop.run_step()


def test_ragged_kgroup_sequential_fallback_matches_k1(monkeypatch):
    """K=2 over ragged shapes (with the single-step fallback) produces EXACTLY
    the same final params and batch_stats as steps_per_call=1 over the same
    batches — no padding ever enters the step (VERDICT r3 next #8)."""
    import jax
    import optax

    import focoos_tpu.trainer.trainer as trainer_mod
    from focoos_tpu.trainer.trainer import TrainerLoop
    from focoos_tpu.trainer.train_step import (
        build_multi_train_step,
        build_train_step,
        create_train_state,
    )

    def loss_fn(variables, batch, rng):
        w = variables["params"]["w"]
        x = batch["img"]
        loss = jnp.mean((x * w) ** 2)  # mean over pixels: padding WOULD change it
        # fake BN running stat: batch mean, also padding-sensitive
        return loss, ({"l": loss}, {"batch_stats": {"mean": jnp.mean(x)}})

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.ones(())}, "batch_stats": {"mean": jnp.zeros(())}}
    k = jax.random.PRNGKey(3)
    mk = lambda shape, i: {"img": jax.random.normal(jax.random.fold_in(k, i), shape)}
    batches = [mk((2, 4, 4, 3), 0), mk((2, 8, 8, 3), 1), mk((2, 8, 8, 3), 2), mk((2, 4, 4, 3), 3)]

    single = build_train_step(loss_fn, tx, donate=False)
    s_ref = create_train_state(dict(variables), tx)
    for b in batches:
        s_ref, _ = single(s_ref, b, jax.random.PRNGKey(0))

    warnings = []
    monkeypatch.setattr(trainer_mod.logger, "warning", lambda msg, *a: warnings.append(msg))
    multi = build_multi_train_step(loss_fn, tx, steps_per_call=2, donate=False)
    s0 = create_train_state(dict(variables), tx)
    loop = TrainerLoop(multi, s0, iter(batches), max_iter=4, steps_per_call=2,
                       single_step_fn=single)
    loop.run_step()
    loop.run_step()

    np.testing.assert_array_equal(np.asarray(loop.state.params["w"]), np.asarray(s_ref.params["w"]))
    np.testing.assert_array_equal(np.asarray(loop.state.batch_stats["mean"]),
                                  np.asarray(s_ref.batch_stats["mean"]))
    assert int(loop.state.step) == 4
    fb_warnings = [m for m in warnings if "falling back to sequential" in m]
    assert len(fb_warnings) == 1  # once, not per step


def test_same_shape_kgroup_keeps_stacked_fast_path():
    """Same-shape micro-batches still take the single-dispatch scanned step."""
    import jax

    from focoos_tpu.trainer.trainer import TrainerLoop

    seen = []

    def step_fn(state, batch, rng):
        seen.append(jax.tree.map(lambda x: x.shape, batch))
        return state, {"total_loss": jnp.asarray(0.0)}

    batches = iter([{"img": jnp.ones((2, 4, 4, 3))}] * 4)
    loop = TrainerLoop(step_fn, state={}, data_iter=batches, max_iter=4, steps_per_call=2,
                       single_step_fn=lambda s, b, r: (_ for _ in ()).throw(AssertionError("fallback used")))
    loop.run_step()
    assert seen[0]["img"] == (2, 2, 4, 4, 3)
