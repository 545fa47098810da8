"""Dataset conversion: raw scenes -> the chunked `.torch` format.

Parity target: reference src/scripts/convert_dl3dv.py:18-66 and the other
converters — writes ~100MB `.torch` chunk files of
{key, url, timestamps, cameras (V, 18), images: list of raw-JPEG-byte
tensors} plus index.json.

Scene input layout: <in_root>/<scene>/ with images/<frame>.jpg|png and a
poses file — either transforms.json (nerfstudio-style), or cameras.npz with
{intrinsics (V,3,3) normalized or pixels, extrinsics_w2c|extrinsics_c2w
(V,4,4)}.
"""
from __future__ import annotations

import argparse
import io
import json
import pathlib

import numpy as np


def _encode_jpeg(path: pathlib.Path) -> bytes:
    from PIL import Image

    if path.suffix.lower() in (".jpg", ".jpeg"):
        return path.read_bytes()
    buf = io.BytesIO()
    Image.open(path).convert("RGB").save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _cameras_18(intrinsics: np.ndarray, w2c: np.ndarray) -> np.ndarray:
    """Normalized K (V,3,3) + w2c (V,4,4) -> the (V, 18) row format."""
    v = intrinsics.shape[0]
    out = np.zeros((v, 18), np.float32)
    out[:, 0] = intrinsics[:, 0, 0]
    out[:, 1] = intrinsics[:, 1, 1]
    out[:, 2] = intrinsics[:, 0, 2]
    out[:, 3] = intrinsics[:, 1, 2]
    out[:, 6:] = w2c[:, :3].reshape(v, 12)
    return out


def load_scene_cameras(scene_dir: pathlib.Path):
    """Returns (normalized K (V,3,3), w2c (V,4,4), image paths)."""
    imgs = sorted(
        p for p in (scene_dir / "images").iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    ) if (scene_dir / "images").exists() else sorted(
        p for p in scene_dir.iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    tj = scene_dir / "transforms.json"
    npz = scene_dir / "cameras.npz"
    if tj.exists():
        with tj.open() as f:
            meta = json.load(f)
        w = meta.get("w", 1)
        h = meta.get("h", 1)
        K = np.eye(3, dtype=np.float32)
        K[0, 0] = meta["fl_x"] / w
        K[1, 1] = meta["fl_y"] / h
        K[0, 2] = meta.get("cx", w / 2) / w
        K[1, 2] = meta.get("cy", h / 2) / h
        c2w = np.stack(
            [np.asarray(fr["transform_matrix"], np.float32)
             for fr in meta["frames"]]
        )
        v = c2w.shape[0]
        return np.tile(K, (v, 1, 1)), np.linalg.inv(c2w), imgs[:v]
    if npz.exists():
        data = np.load(npz)
        K = data["intrinsics"].astype(np.float32)
        if K[..., 0, 0].max() > 10:  # pixel-space -> normalize by image size
            from PIL import Image

            w, h = Image.open(imgs[0]).size
            K = K.copy()
            K[:, 0] /= w
            K[:, 1] /= h
        if "extrinsics_w2c" in data:
            w2c = data["extrinsics_w2c"].astype(np.float32)
        else:
            w2c = np.linalg.inv(data["extrinsics_c2w"].astype(np.float32))
        return K, w2c, imgs[: K.shape[0]]
    raise FileNotFoundError(f"no transforms.json or cameras.npz in {scene_dir}")


def convert_scenes(in_root, out_root, stage: str = "test",
                   chunk_mb: int = 100):
    import torch

    in_root = pathlib.Path(in_root)
    out_dir = pathlib.Path(out_root) / stage
    out_dir.mkdir(parents=True, exist_ok=True)
    index = {}
    chunk, chunk_bytes, chunk_id = [], 0, 0

    def flush():
        nonlocal chunk, chunk_bytes, chunk_id
        if not chunk:
            return
        name = f"{chunk_id:06d}.torch"
        torch.save(chunk, out_dir / name)
        for ex in chunk:
            index[ex["key"]] = name
        chunk, chunk_bytes = [], 0
        chunk_id += 1

    for scene_dir in sorted(p for p in in_root.iterdir() if p.is_dir()):
        try:
            K, w2c, img_paths = load_scene_cameras(scene_dir)
        except FileNotFoundError as e:
            print(f"skip {scene_dir.name}: {e}")
            continue
        images = []
        for p in img_paths:
            raw = _encode_jpeg(p)
            images.append(torch.frombuffer(bytearray(raw), dtype=torch.uint8))
            chunk_bytes += len(raw)
        chunk.append({
            "key": scene_dir.name,
            "cameras": torch.from_numpy(_cameras_18(K, w2c)),
            "images": images,
            "url": "",
            "timestamps": torch.arange(len(images)),
        })
        if chunk_bytes > chunk_mb * 1024 * 1024:
            flush()
    flush()
    with open(out_dir / "index.json", "w") as f:
        json.dump(index, f, indent=2)
    print(f"wrote {chunk_id} chunks, {len(index)} scenes -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--stage", default="test")
    ap.add_argument("--chunk_mb", type=int, default=100)
    args = ap.parse_args()
    convert_scenes(args.input_dir, args.output_dir, args.stage, args.chunk_mb)


if __name__ == "__main__":
    main()
