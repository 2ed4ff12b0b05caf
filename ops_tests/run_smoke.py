"""End-to-end smoke suite (analog of the reference's ops/ integration tests,
ops/test_training.py / test_export.py / test_validation.py — which download
public datasets; here synthetic datasets keep it offline).

Runs, per family: short real training → eval → export → InferModel inference.

Usage: python ops_tests/run_smoke.py [detr|cls|mf|bisenet|all]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _common(task, dataset_dir, model_name, family_kwargs, max_iters=4, res=96):
    import numpy as np

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, RuntimeType, TrainerArgs

    auto = AutoDataset(dataset_dir, task, family_kwargs.pop("layout", "roboflow_coco"))
    tr_augs, va_augs = get_default_by_task(task, resolution=res)
    train_ds = auto.get_split(tr_augs, DatasetSplitType.TRAIN)
    val_ds = auto.get_split(va_augs, DatasetSplitType.VAL)

    model = ModelManager.get(
        model_name,
        num_classes=train_ds.metadata.num_classes,
        classes=train_ds.metadata.classes,
        image_size=res,
        **family_kwargs,
    )
    run_dir = tempfile.mkdtemp(prefix="smoke_")
    args = TrainerArgs(
        run_name="smoke", output_dir=run_dir, max_iters=max_iters, batch_size=2,
        eval_period=0, log_period=2, checkpointer_period=max_iters, early_stop=False, workers=2,
        max_instances_per_image=10,
    )
    result = model.train(args, train_ds, val_ds)
    print(f"  trained {max_iters} iters → {result['run_dir']}")
    assert os.path.isfile(os.path.join(result["run_dir"], "model_final.npz"))

    # export + serve roundtrip
    infer_model = model.export(RuntimeType.XLA_CPU, out_dir=os.path.join(run_dir, "export"), image_size=res)
    img = np.random.randint(0, 255, (res, res, 3), np.uint8)
    res_out = infer_model.infer(img, threshold=0.0)
    print(f"  export+infer OK ({len(res_out.detections)} detections)")
    return True


def smoke_detr(tmp):
    from make_synthetic_dataset import make

    from focoos_tpu.ports import Task

    d = make(os.path.join(tmp, "det"), n_train=8, n_val=4, size=160)
    return _common(Task.DETECTION, d, "fai-detr-m-coco",
                   dict(num_queries=10, transformer_predictor_dec_layers=2))


def smoke_cls(tmp):
    from make_synthetic_dataset import make_cls

    from focoos_tpu.ports import Task

    d = make_cls(os.path.join(tmp, "cls"), n_per_class=4, size=96)
    return _common(Task.CLASSIFICATION, d, "fai-cls-n-coco", dict(layout="cls_folder"))


def smoke_mf(tmp):
    from make_synthetic_dataset import make

    from focoos_tpu.ports import Task

    d = make(os.path.join(tmp, "ins"), n_train=8, n_val=4, size=160)
    return _common(
        Task.INSTANCE_SEGMENTATION, d, "fai-mf-s-coco-ins",
        dict(num_queries=10, transformer_predictor_dec_layers=2, criterion_num_points=256,
             postprocessing_type="instance"),
    )


def smoke_bisenet(tmp):
    from make_synthetic_dataset import make_semseg

    from focoos_tpu.ports import Task

    d = make_semseg(os.path.join(tmp, "seg"), n_train=8, n_val=4, size=160)
    return _common(
        Task.SEMSEG, d, "bisenetformer-s-ade",
        dict(layout="roboflow_seg", num_queries=10, transformer_predictor_dec_layers=2,
             criterion_num_points=256),
    )


def smoke_rtmo(tmp):
    from make_synthetic_dataset import make_keypoints

    from focoos_tpu.ports import Task

    d = make_keypoints(os.path.join(tmp, "kpt"), n_train=8, n_val=4, size=192)
    return _common(
        Task.KEYPOINT, d, "rtmo-s-coco",
        dict(transformer_encoder_layers=1, nms_pre_topk=50, max_detections=10),
        res=128,
    )


SMOKES = {"detr": smoke_detr, "cls": smoke_cls, "mf": smoke_mf, "bisenet": smoke_bisenet, "rtmo": smoke_rtmo}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    todo = list(SMOKES) if which == "all" else [which]
    tmp = tempfile.mkdtemp(prefix="smoke_data_")
    failed = []
    for name in todo:
        print(f"== smoke {name}")
        try:
            SMOKES[name](tmp)
            print(f"   {name} PASS")
        except Exception:
            import traceback

            traceback.print_exc()
            failed.append(name)
            print(f"   {name} FAIL")
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL SMOKE TESTS PASSED")
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)  # skip interpreter teardown (daemon prefetch threads)
