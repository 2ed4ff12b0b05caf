"""Data pipeline tests: transforms, datasets, mappers, loaders."""

import os
import sys

import numpy as np
import pytest

from focoos_tpu.data import transforms as T
from focoos_tpu.data.default_aug import DatasetAugmentations, get_default_by_task
from focoos_tpu.ports import DatasetSplitType, Task

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from make_synthetic_dataset import make

    root = tmp_path_factory.mktemp("synth")
    return make(str(root), n_train=6, n_val=3, size=160)


def test_hflip_boxes(sample_image):
    tfm = T.HFlipTransform(width=640)
    boxes = np.array([[10.0, 20.0, 110.0, 120.0]])
    out = tfm.apply_box(boxes)
    np.testing.assert_allclose(out, [[530.0, 20.0, 630.0, 120.0]])
    img = tfm.apply_image(sample_image)
    np.testing.assert_array_equal(img[:, 0], sample_image[:, -1])


def test_resize_transform_coords():
    tfm = T.ResizeTransform(100, 200, 50, 100)
    coords = np.array([[200.0, 100.0]])
    np.testing.assert_allclose(tfm.apply_coords(coords), [[100.0, 50.0]])


def test_crop_and_pad_roundtrip(sample_image):
    crop = T.CropTransform(10, 20, 100, 50)
    out = crop.apply_image(sample_image)
    assert out.shape[:2] == (50, 100)
    pad = T.PadTransform(5, 5, 5, 5)
    out2 = pad.apply_image(out)
    assert out2.shape[:2] == (60, 110)


def test_augmentation_pipeline_consistency(sample_image):
    augs = DatasetAugmentations(resolution=128, horizontal_flip=1.0, square=1.0)
    pipeline = T.AugmentationList(augs.get_augmentations())
    boxes = np.array([[10.0, 10.0, 100.0, 100.0]], np.float32)
    ai = T.AugInput(sample_image.copy(), boxes=boxes)
    pipeline(ai)
    assert ai.image.shape[:2] == (128, 128)
    assert ai.boxes.shape == (1, 4)
    assert np.all(ai.boxes[:, 2] >= ai.boxes[:, 0])


def test_default_presets_cover_all_tasks():
    for task in Task:
        train, val = get_default_by_task(task, resolution=320)
        assert train.resolution == 320
        assert len(train.get_augmentations(task=task)) >= 1


def test_roboflow_coco_parsing(synth_dir):
    from focoos_tpu.data.datasets import DictDataset

    ds = DictDataset.from_roboflow_coco(os.path.join(synth_dir, "train"), Task.DETECTION)
    assert len(ds) == 6
    assert ds.metadata.thing_classes == ["circle", "square", "triangle"]
    rec = ds[0]
    assert os.path.isfile(rec["file_name"])
    assert all("bbox" in a for a in rec["annotations"])


def test_auto_dataset_end_to_end(synth_dir):
    from focoos_tpu.data.auto_dataset import AutoDataset

    auto = AutoDataset(synth_dir, Task.DETECTION)
    train_augs, _ = get_default_by_task(Task.DETECTION, resolution=96)
    ds = auto.get_split(train_augs, DatasetSplitType.TRAIN)
    entry = ds[0]
    assert entry.image is not None and entry.instances is not None
    assert len(entry.instances) >= 1


@pytest.mark.slow
def test_train_loader_batches(synth_dir):
    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.loaders import build_train_loader
    from focoos_tpu.model_manager import ModelManager

    auto = AutoDataset(synth_dir, Task.DETECTION)
    train_augs, _ = get_default_by_task(Task.DETECTION, resolution=96)
    ds = auto.get_split(train_augs, DatasetSplitType.TRAIN)
    model = ModelManager.get(
        "fai-detr-m-coco", num_classes=3, image_size=96, num_queries=10, transformer_predictor_dec_layers=2
    )
    model.processor.train(True)
    loader = build_train_loader(ds, model.processor, total_batch_size=2, num_workers=1, max_instances=5)
    it = iter(loader)
    batch, targets = next(it)
    assert batch.shape[0] == 2 and batch.shape[-1] == 3
    assert targets.labels.shape == (2, 5)
    model.processor.train(False)


def test_extent_transform_geometry():
    from focoos_tpu.data.transforms import ExtentTransform

    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    # identity subrect reproduces the image exactly
    t = ExtentTransform((0, 0, 30, 20), (20, 30))
    np.testing.assert_array_equal(t.apply_image(img), img)
    # out-of-bounds subrect zero-pads
    t2 = ExtentTransform((-10, -10, 20, 10), (20, 30))
    out = t2.apply_image(img)
    assert out.shape == (20, 30, 3)
    assert (out[:5, :5] == 0).all()  # region left/above the source
    # coords map linearly into output space
    c = t2.apply_coords(np.array([[-10.0, -10.0], [20.0, 10.0]]))
    np.testing.assert_allclose(c, [[0, 0], [30, 20]])


def test_random_lighting_preserves_shape_dtype():
    from focoos_tpu.data.transforms import RandomLighting

    np.random.seed(0)
    img = np.full((8, 8, 3), 128, np.uint8)
    t = RandomLighting(5.0).get_transform(img)
    out = t.apply_image(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)
    np.testing.assert_array_equal(t.apply_coords(np.array([[1.0, 2.0]])), [[1.0, 2.0]])


def test_aspect_ratio_grouping_buckets():
    """Wide and tall entries never mix in one batch (reference:
    AspectRatioGroupedDataset, data/loaders.py:70)."""
    from focoos_tpu.data.loaders import TrainingSampler, _Prefetcher
    from focoos_tpu.ports import DatasetEntry

    class DS:
        def __len__(self):
            return 40

        def __getitem__(self, i):
            return DatasetEntry(width=20 if i % 2 == 0 else 10,
                                height=10 if i % 2 == 0 else 20)

    p = _Prefetcher(DS(), TrainingSampler(40, shuffle=False, seed=0), batch_size=4,
                    num_workers=1, collate=lambda es: es, aspect_ratio_grouping=True)
    it = iter(p)
    for _ in range(6):
        batch = next(it)
        assert len(batch) == 4
        wides = [e.width > e.height for e in batch]
        assert all(wides) or not any(wides)


def test_catalog_registry_lists_builtins():
    from focoos_tpu.data.catalog import list_catalog, load_catalog_split
    from focoos_tpu.ports import DatasetSplitType

    names = list_catalog()
    # full reference breadth (catalog.py:34-120): COCO det/ins/kpts/cls +
    # ade20k semseg/instance + voc semseg
    for expected in ("coco_2017_det", "coco_2017_ins", "coco_2017_kpts",
                     "coco_2017_cls", "ade20k_semseg", "ade20k_instance", "voc_semseg"):
        assert expected in names, names
    # loading without the data on disk raises a clear error, not a crash
    with pytest.raises((FileNotFoundError, ValueError, AssertionError)):
        load_catalog_split(names[0], DatasetSplitType.TRAIN)


def test_catalog_semseg_split_loads_from_disk(tmp_path, monkeypatch):
    """ade20k-style semseg catalog entry resolves image↔gt pairs + classes."""
    import json

    import focoos_tpu.data.catalog as catalog_mod
    from focoos_tpu.ports import DatasetSplitType, Task

    monkeypatch.setattr(catalog_mod, "DATASETS_DIR", str(tmp_path))
    root = tmp_path / "ADEChallengeData2016"
    (root / "images/training").mkdir(parents=True)
    (root / "annotations_detectron2/training").mkdir(parents=True)
    info = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [{"image_id": 1, "file_name": "a.png"}],
        "categories": [{"id": 0, "name": "wall"}, {"id": 1, "name": "sky"}],
    }
    (root / "ade20k_semseg_train.json").write_text(json.dumps(info))
    ds = catalog_mod.load_catalog_split("ade20k_semseg", DatasetSplitType.TRAIN)
    assert len(ds) == 1
    rec = ds[0]
    assert rec["file_name"].endswith("images/training/a.jpg")
    assert rec["sem_seg_file_name"].endswith("annotations_detectron2/training/a.png")
    assert ds.metadata.task == Task.SEMSEG and ds.metadata.num_classes == 2


def test_convert_to_mask_format_and_datasetninja(tmp_path):
    """convert_datasetninja_to_mask_dataset → ROBOFLOW_SEG loadable layout;
    convert_to_mask_format re-exports a semseg DictDataset
    (reference: converters.py:236, :359)."""
    import json

    import cv2

    from focoos_tpu.data.converters import (
        convert_datasetninja_to_mask_dataset,
        convert_to_mask_format,
    )
    from focoos_tpu.data.datasets import DictDataset
    from focoos_tpu.ports import DatasetMetadata, Task

    # build a tiny datasetninja-layout dataset
    src = tmp_path / "ninja"
    for split in ("train", "val"):
        (src / split / "img").mkdir(parents=True)
        (src / split / "ann").mkdir(parents=True)
        img = np.zeros((32, 32, 3), np.uint8)
        cv2.imwrite(str(src / split / "img" / "x.jpg"), img)
        ann = {
            "size": {"height": 32, "width": 32},
            "objects": [{
                "classTitle": "car", "geometryType": "polygon",
                "points": {"exterior": [[2, 2], [20, 2], [20, 20], [2, 20]]},
            }],
        }
        (src / split / "ann" / "x.json").write_text(json.dumps(ann))
    (src / "meta.json").write_text(json.dumps({"classes": [{"title": "car"}]}))

    out = convert_datasetninja_to_mask_dataset(str(tmp_path), "ninja", "converted")
    for split in ("train", "valid"):
        d = os.path.join(out, split)
        assert os.path.isfile(os.path.join(d, "_classes.csv"))
        assert os.path.isfile(os.path.join(d, "x.jpg"))
        mask = cv2.imread(os.path.join(d, "x_mask.png"), cv2.IMREAD_UNCHANGED)
        assert mask is not None and mask.shape == (32, 32)
        assert mask[10, 10] == 1  # car (after background insertion at 0)
        assert mask[30, 30] == 0  # background, not 255-ignore

    # the converted layout loads through the ROBOFLOW_SEG parser
    ds = DictDataset.from_roboflow_seg(os.path.join(out, "train"))
    assert len(ds) == 1 and ds.metadata.num_classes == 2

    # and round-trips through convert_to_mask_format
    out2 = convert_to_mask_format(ds, str(tmp_path / "reexport"))
    assert os.path.isfile(os.path.join(out2, "_classes.csv"))
    assert os.path.isfile(os.path.join(out2, "x_mask.png"))


def test_transform_box_coords_consistency():
    """Boxes track image geometry through flip and rotation."""
    from focoos_tpu.data.transforms import HFlipTransform, RotationTransform

    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    t = HFlipTransform(width=100)
    fb = t.apply_box(boxes)
    np.testing.assert_allclose(fb, [[70, 20, 90, 40]])

    # 90-degree rotation with expansion maps a box exactly
    r = RotationTransform(h=50, w=100, angle=90, expand=True)
    rb = r.apply_box(np.array([[0.0, 0.0, 10.0, 10.0]]))[0]
    img = np.zeros((50, 100, 3), np.uint8)
    img[0:10, 0:10] = 255
    rimg = r.apply_image(img)
    ys, xs = np.nonzero(rimg[..., 0])
    # rotated white square must sit inside the transformed box (±1 px)
    assert xs.min() >= rb[0] - 1 and xs.max() <= rb[2] + 1
    assert ys.min() >= rb[1] - 1 and ys.max() <= rb[3] + 1


def test_supervisely_to_coco_and_masks(tmp_path):
    """Converters: Supervisely → COCO json and class-index PNG masks
    (reference: focoos/data/converters.py)."""
    import json

    import cv2

    from focoos_tpu.data.converters import supervisely_to_coco, supervisely_to_semseg_masks

    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    ann = {
        "size": {"height": 40, "width": 60},
        "objects": [
            {"classTitle": "cat", "geometryType": "rectangle",
             "points": {"exterior": [[10, 5], [30, 25]]}},
            {"classTitle": "dog", "geometryType": "polygon",
             "points": {"exterior": [[0, 0], [20, 0], [20, 20], [0, 20]]}},
        ],
    }
    (ann_dir / "im1.jpg.json").write_text(json.dumps(ann))

    out_json = str(tmp_path / "coco.json")
    supervisely_to_coco(str(ann_dir), str(tmp_path), out_json)
    coco = json.loads(open(out_json).read())
    assert len(coco["images"]) == 1 and coco["images"][0]["height"] == 40
    assert len(coco["annotations"]) == 2
    rect = coco["annotations"][0]
    assert rect["bbox"] == [10, 5, 20, 20]
    assert {c["name"] for c in coco["categories"]} == {"cat", "dog"}

    mask_dir = str(tmp_path / "masks")
    supervisely_to_semseg_masks(str(ann_dir), mask_dir, ["cat", "dog"])
    m = cv2.imread(mask_dir + "/im1_mask.png", cv2.IMREAD_GRAYSCALE)
    assert m.shape == (40, 60)
    assert m[10, 10] == 1  # inside the dog polygon
    assert m[35, 55] == 255  # untouched → ignore value


def test_resize_dataset_rescales_annotations(tmp_path):
    import json

    import cv2

    from focoos_tpu.data.converters import resize_dataset

    src = tmp_path / "src" / "train"
    src.mkdir(parents=True)
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(src / "a.jpg"), img)
    coco = {
        "images": [{"id": 0, "file_name": "a.jpg", "height": 100, "width": 200}],
        "annotations": [{"id": 1, "image_id": 0, "category_id": 0,
                         "bbox": [20, 10, 40, 30], "area": 1200, "segmentation": []}],
        "categories": [{"id": 0, "name": "c"}],
    }
    (src / "_annotations.coco.json").write_text(json.dumps(coco))

    dst = str(tmp_path / "dst")
    resize_dataset(str(tmp_path / "src"), dst, max_size=100)
    out = json.loads(open(dst + "/train/_annotations.coco.json").read())
    assert out["images"][0]["width"] == 100 and out["images"][0]["height"] == 50
    assert out["annotations"][0]["bbox"] == [10.0, 5.0, 20.0, 15.0]
    im = cv2.imread(dst + "/train/a.jpg")
    assert im.shape[:2] == (50, 100)


def test_color_aug_ssd_lut_matches_float_oracle():
    """The LUT fast path must be bit-exact with the float32 formulation
    (same np.random stream => same draws => identical pixels)."""
    aug = T.ColorAugSSD()
    rng = np.random.default_rng(7)
    mismatches = 0
    for trial in range(64):
        img = rng.integers(0, 256, (48, 64, 3), np.uint8)
        np.random.seed(trial)
        ai = T.AugInput(img.copy())
        aug(ai)
        np.random.seed(trial)
        ref = aug._apply_float(img.copy())
        if not np.array_equal(ai.image, ref):
            mismatches += 1
    assert mismatches == 0


def test_imagelist_keeps_uint8_dtype():
    from focoos_tpu.structures import ImageList

    ims = [np.full((30, 40, 3), 7, np.uint8), np.full((50, 20, 3), 9, np.uint8)]
    il = ImageList.from_tensors(ims)
    assert il.tensor.dtype == np.uint8
    fl = ImageList.from_tensors([i.astype(np.float32) for i in ims])
    assert fl.tensor.dtype == np.float32


def test_process_prefetcher_deterministic_order_and_parity():
    """Process workers yield the SAME entry stream as the thread backend
    (seq reordering) — determinism parity with workers=0 (VERDICT r3 next #3;
    reference: torch DataLoader worker ordering, data/loaders.py:94-132)."""
    from focoos_tpu.data.loaders import _Prefetcher, _ProcessPrefetcher

    class Ds:
        def __getitem__(self, i):
            return {"idx": i, "payload": np.full((4, 4), i, np.int32)}

    sampler = list(range(24))
    collate = lambda entries: [e["idx"] for e in entries]  # noqa: E731

    tp = _Prefetcher(Ds(), iter(sampler), batch_size=4, num_workers=2, collate=collate)
    pp = _ProcessPrefetcher(Ds(), iter(sampler), batch_size=4, num_workers=2, collate=collate)
    it_t, it_p = iter(tp), iter(pp)
    for _ in range(6):
        assert next(it_t) == next(it_p)
    pp.close()


def test_prefetchers_end_cleanly_on_finite_sampler():
    """A FINITE sampler ends the iterator (partial trailing batch included) on
    both backends — torch DataLoader one-epoch semantics — instead of leaking
    StopIteration out of the producer/feeder thread and hanging the consumer
    (production TrainingSampler is infinite; this is the test/custom-sampler
    contract)."""
    from focoos_tpu.data.loaders import _Prefetcher, _ProcessPrefetcher

    class Ds:
        def __getitem__(self, i):
            return {"idx": i}

    collate = lambda entries: [e["idx"] for e in entries]  # noqa: E731

    # 10 entries / batch 4 -> [0..3], [4..7], [8, 9] then StopIteration
    for cls in (_Prefetcher, _ProcessPrefetcher):
        batches = list(cls(Ds(), iter(range(10)), batch_size=4, num_workers=2,
                           collate=collate))
        assert batches == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]], cls.__name__

    # aspect-ratio grouping flushes its trailing partial buckets too
    class Entry(dict):
        pass

    def getwh(i):
        e = Entry(idx=i)
        e.width = 2 if i % 2 else 1
        e.height = 1 if i % 2 else 2
        return e

    class DsAttr:
        def __getitem__(self, i):
            return getwh(i)

    batches = list(_Prefetcher(DsAttr(), iter(range(5)), batch_size=2, num_workers=1,
                               collate=lambda es: sorted(e["idx"] for e in es),
                               aspect_ratio_grouping=True))
    assert sorted(sum(batches, [])) == [0, 1, 2, 3, 4]
    assert all(len(b) <= 2 for b in batches)


def test_process_prefetcher_surfaces_worker_failure():
    from focoos_tpu.data.loaders import _ProcessPrefetcher

    class Ds:
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom at 3")
            return {"idx": i}

    pp = _ProcessPrefetcher(Ds(), iter(range(16)), batch_size=2, num_workers=2,
                            collate=lambda e: e)
    it = iter(pp)
    with pytest.raises(RuntimeError, match="boom at 3"):
        for _ in range(8):
            next(it)


def test_process_prefetcher_bounded_when_consumer_stops(tmp_path):
    """With an infinite sampler and a stopped consumer, mapper work must be
    BOUNDED by the queue caps (task_q + result_q + batch queue) — an
    unbounded result queue let the workers map forever after training ended,
    starving the post-training eval running in the same process (measured
    10-25x eval slowdown; fixed by capping result_q and closing the loader
    in FocoosTrainer.train's finally)."""
    import itertools
    import time

    from focoos_tpu.data.loaders import _ProcessPrefetcher

    marker = tmp_path / "count"
    marker.write_bytes(b"")

    class Ds:
        def __init__(self, path):
            self._p = str(path)

        def __getitem__(self, i):
            with open(self._p, "ab") as f:
                f.write(b"x")
            return {"idx": i}

    bs, nw = 4, 2
    pp = _ProcessPrefetcher(Ds(marker), itertools.count(), batch_size=bs, num_workers=nw,
                            collate=lambda e: e)
    it = iter(pp)
    next(it)  # start everything, consume one batch, then stop consuming
    # poll until the mapped-item count plateaus (no growth across several
    # consecutive windows) instead of fixed sleeps — on a loaded CI host the
    # initial burst may be smeared over arbitrary wall time
    last, stable = -1, 0
    t_end = time.time() + 30.0
    while time.time() < t_end and stable < 4:
        time.sleep(0.5)
        n = marker.stat().st_size
        stable = stable + 1 if n == last else 0
        last = n
    assert stable >= 4, f"mapper never plateaued within 30s ({last} items) — unbounded"
    # boundedness vs the computed caps (+ headroom): task_q 4*bs, result_q
    # 4*bs, batch queue maxsize batches of bs, one in-flight item per worker,
    # one consumed batch
    cap = 4 * bs + 4 * bs + pp._q.maxsize * bs + nw + bs
    assert last <= cap + 2 * bs, f"mapper ran past the queue caps: {last} > {cap} items"

    procs = list(pp._procs)
    pp.close()
    deadline = time.time() + 5.0
    while time.time() < deadline and any(p.is_alive() for p in procs):
        time.sleep(0.05)
    assert all(not p.is_alive() for p in procs), "close() must terminate the workers"


def test_thread_prefetcher_close_stops_producer(tmp_path):
    import itertools
    import time

    from focoos_tpu.data.loaders import _Prefetcher

    class Ds:
        def __getitem__(self, i):
            return {"idx": i}

    p = _Prefetcher(Ds(), itertools.count(), batch_size=2, num_workers=2,
                    collate=lambda e: e)
    it = iter(p)
    next(it)
    p.close()
    deadline = time.time() + 5.0
    while time.time() < deadline and any(t.is_alive() for t in p._threads):
        time.sleep(0.05)
    assert all(not t.is_alive() for t in p._threads), "close() must stop the producer thread"


def test_mapper_crowd_handling(tmp_path):
    """Train mappers DROP crowd annotations (reference
    detection_dataset_mapper filters iscrowd); eval mappers KEEP them marked
    via instances.iscrowd so the COCO evaluator can apply the crowd-ignore
    convention. Crowd segmentations arrive as compressed-RLE dicts."""
    import cv2

    from focoos_tpu.data.mappers import InstanceDatasetMapper
    from focoos_tpu.utils import native

    h, w = 96, 128
    img_path = str(tmp_path / "im.png")
    cv2.imwrite(img_path, np.zeros((h, w, 3), np.uint8))

    crowd_mask = np.zeros((h, w), bool)
    crowd_mask[10:40, 20:70] = True
    rle = {"size": [h, w], "counts": native.rle_to_string(native.rle_encode(crowd_mask))}
    record = {
        "file_name": img_path,
        "height": h,
        "width": w,
        "image_id": 1,
        "annotations": [
            {"bbox": [5, 5, 30, 30], "category_id": 0, "iscrowd": 0,
             "segmentation": [[5, 5, 35, 5, 35, 35, 5, 35]]},
            {"bbox": [20, 10, 50, 30], "category_id": 0, "iscrowd": 1,
             "segmentation": rle},
        ],
    }

    train_entry = InstanceDatasetMapper([], is_train=True)(dict(record))
    assert len(train_entry.instances) == 1
    assert int(np.asarray(train_entry.instances.iscrowd).sum()) == 0

    eval_entry = InstanceDatasetMapper([], is_train=False)(dict(record))
    assert len(eval_entry.instances) == 2
    np.testing.assert_array_equal(np.asarray(eval_entry.instances.iscrowd), [0, 1])
    # the RLE-decoded crowd mask survived the (identity) transform pipeline
    got = np.asarray(eval_entry.instances.masks.tensor[1])
    np.testing.assert_array_equal(got, crowd_mask)


def test_mask_iou_resolution_mismatch_fails_loudly():
    """A GT mask at a different resolution than the packed dt masks must
    raise, not silently truncate to a plausible-but-wrong IoU (ADVICE r4)."""
    from focoos_tpu.ops.mask_iou import device_mask_iou_packed

    rng = np.random.default_rng(0)
    h, w = 16, 24
    dt = rng.random((3, h, w)) > 0.5
    packed = np.packbits(dt.reshape(3, -1), axis=-1)
    with pytest.raises(ValueError, match="pixels"):
        device_mask_iou_packed(packed, (h, w), [np.zeros((h, w * 2), bool)])
    with pytest.raises(ValueError, match="packed width"):
        device_mask_iou_packed(packed, (h * 2, w), [np.zeros((h * 2, w), bool)])
