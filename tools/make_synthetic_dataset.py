"""Generate a tiny synthetic Roboflow-COCO dataset (colored shapes) for e2e
training smoke tests — the offline stand-in for the reference's ops/ suite
downloads (ops/test_training.py:43-62, which needs network)."""

from __future__ import annotations

import json
import os

import numpy as np

CLASSES = ["circle", "square", "triangle"]


def make(root: str, n_train: int = 24, n_val: int = 8, size: int = 320, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        images, annotations = [], []
        aid = 1
        for i in range(n):
            img = rng.integers(0, 80, (size, size, 3), np.uint8)
            n_obj = rng.integers(1, 4)
            for _ in range(n_obj):
                cls = int(rng.integers(0, len(CLASSES)))
                s = int(rng.integers(30, 90))
                x = int(rng.integers(0, size - s))
                y = int(rng.integers(0, size - s))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                if cls == 0:
                    cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, -1)
                    seg = [[x + s / 2 + s / 2 * np.cos(t), y + s / 2 + s / 2 * np.sin(t)]
                           for t in np.linspace(0, 2 * np.pi, 12)]
                elif cls == 1:
                    cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
                    seg = [[x, y], [x + s, y], [x + s, y + s], [x, y + s]]
                else:
                    pts = np.array([[x + s // 2, y], [x, y + s], [x + s, y + s]])
                    cv2.fillPoly(img, [pts], color)
                    seg = pts.tolist()
                annotations.append(
                    dict(id=aid, image_id=i, category_id=cls + 1, bbox=[x, y, s, s],
                         area=s * s, iscrowd=0, segmentation=[list(np.array(seg).flatten().astype(float))])
                )
                aid += 1
            fn = f"img_{i:04d}.jpg"
            cv2.imwrite(os.path.join(sdir, fn), img[:, :, ::-1])
            images.append(dict(id=i, file_name=fn, height=size, width=size))
        cats = [dict(id=0, name="shapes", supercategory="none")] + [
            dict(id=ci + 1, name=c, supercategory="shapes") for ci, c in enumerate(CLASSES)
        ]
        with open(os.path.join(sdir, "_annotations.coco.json"), "w") as f:
            json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return root


if __name__ == "__main__":
    import sys

    make(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_shapes")
    print("done")


def make_cls(root: str, n_per_class: int = 8, size: int = 128, seed: int = 0):
    """Folder-per-class classification dataset."""
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_per_class), ("valid", max(2, n_per_class // 3))):
        for ci, cname in enumerate(CLASSES):
            cdir = os.path.join(root, split, cname)
            os.makedirs(cdir, exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 80, (size, size, 3), np.uint8)
                s = int(rng.integers(40, 90))
                x, y = int(rng.integers(0, size - s)), int(rng.integers(0, size - s))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                if ci == 0:
                    cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, -1)
                elif ci == 1:
                    cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
                else:
                    cv2.fillPoly(img, [np.array([[x + s // 2, y], [x, y + s], [x + s, y + s]])], color)
                cv2.imwrite(os.path.join(cdir, f"{cname}_{i:03d}.jpg"), img[:, :, ::-1])
    return root


def make_semseg(root: str, n_train: int = 12, n_val: int = 4, size: int = 160, seed: int = 0):
    """Roboflow-seg layout: image + *_mask.png + _classes.csv."""
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, "_classes.csv"), "w") as f:
            f.write("Pixel Value, Class\n")
            f.write("0, background\n")
            for ci, c in enumerate(CLASSES):
                f.write(f"{ci + 1}, {c}\n")
        for i in range(n):
            img = rng.integers(0, 80, (size, size, 3), np.uint8)
            mask = np.zeros((size, size), np.uint8)
            for _ in range(rng.integers(1, 4)):
                cls = int(rng.integers(0, len(CLASSES)))
                s = int(rng.integers(30, 70))
                x, y = int(rng.integers(0, size - s)), int(rng.integers(0, size - s))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                if cls == 0:
                    cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, -1)
                    cv2.circle(mask, (x + s // 2, y + s // 2), s // 2, cls + 1, -1)
                elif cls == 1:
                    cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
                    cv2.rectangle(mask, (x, y), (x + s, y + s), cls + 1, -1)
                else:
                    pts = np.array([[x + s // 2, y], [x, y + s], [x + s, y + s]])
                    cv2.fillPoly(img, [pts], color)
                    cv2.fillPoly(mask, [pts], cls + 1)
            cv2.imwrite(os.path.join(sdir, f"img_{i:04d}.jpg"), img[:, :, ::-1])
            cv2.imwrite(os.path.join(sdir, f"img_{i:04d}_mask.png"), mask)
    return root


def make_keypoints(root: str, n_train: int = 10, n_val: int = 4, size: int = 192, seed: int = 0, k: int = 17):
    """COCO-keypoints-style roboflow dataset (one 'person' class)."""
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        images, annotations = [], []
        aid = 1
        for i in range(n):
            img = rng.integers(0, 80, (size, size, 3), np.uint8)
            for _ in range(int(rng.integers(1, 3))):
                s = int(rng.integers(60, 120))
                x, y = int(rng.integers(0, size - s)), int(rng.integers(0, size - s))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
                kpts = []
                for _k in range(k):
                    kx = int(rng.integers(x, x + s))
                    ky = int(rng.integers(y, y + s))
                    vis = int(rng.integers(1, 3))
                    cv2.circle(img, (kx, ky), 2, (255, 255, 255), -1)
                    kpts += [kx, ky, vis]
                annotations.append(
                    dict(id=aid, image_id=i, category_id=1, bbox=[x, y, s, s], area=s * s,
                         iscrowd=0, keypoints=kpts, num_keypoints=k)
                )
                aid += 1
            fn = f"img_{i:04d}.jpg"
            cv2.imwrite(os.path.join(sdir, fn), img[:, :, ::-1])
            images.append(dict(id=i, file_name=fn, height=size, width=size))
        cats = [
            dict(id=0, name="people", supercategory="none"),
            dict(id=1, name="person", supercategory="people",
                 keypoints=[f"kp{j}" for j in range(k)], skeleton=[[j, j + 1] for j in range(1, k)]),
        ]
        with open(os.path.join(sdir, "_annotations.coco.json"), "w") as f:
            json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return root
