"""Generate the bundled real-digits fixture (checked-in artifact).

Real handwritten digit images — the UCI Optical Recognition of Handwritten
Digits set that scikit-learn ships inside its own package
(sklearn.datasets.load_digits, 1797 genuine scans at 8x8) — rendered into
the MNIST idx layout the loaders and the PyTorch reference both read
(reference datasets.py:265-315): 28x28 uint8, digits resized into the
centered 20x20 box MNIST itself uses. The bundled MNIST-trained LeNet-5
reads these at ~75% accuracy (vs 10% chance), so the fixture exercises the
full real-file -> loader -> factors -> metrics seam with genuinely real
image bytes on a machine that has no datasets.

Output: curvature_tpu/data/fixtures/digits/MNIST/raw/{train,t10k}-* (.gz),
train = first 512 digits, test = next 512. Deterministic — re-running
reproduces the same bytes (PIL BICUBIC is deterministic).
"""
import gzip
import os
import struct

import numpy as np
from PIL import Image
from sklearn.datasets import load_digits

N_TRAIN, N_TEST, BOX = 512, 512, 20


def write_idx_gz(path, arr):
    arr = np.asarray(arr, np.uint8)
    with gzip.GzipFile(path, "wb", mtime=0) as f:
        f.write(struct.pack(">I", 0x800 + arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def main():
    d = load_digits()
    pad = (28 - BOX) // 2
    imgs = np.stack([
        np.pad(np.asarray(Image.fromarray(
            (im * 255 / 16).astype(np.uint8)).resize((BOX, BOX),
                                                     Image.BICUBIC)), pad)
        for im in d.images])
    labels = d.target.astype(np.uint8)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "..", "curvature_tpu", "data",
        "fixtures", "digits", "MNIST", "raw")
    out = os.path.normpath(out)
    os.makedirs(out, exist_ok=True)
    write_idx_gz(os.path.join(out, "train-images-idx3-ubyte.gz"),
                 imgs[:N_TRAIN])
    write_idx_gz(os.path.join(out, "train-labels-idx1-ubyte.gz"),
                 labels[:N_TRAIN])
    write_idx_gz(os.path.join(out, "t10k-images-idx3-ubyte.gz"),
                 imgs[N_TRAIN:N_TRAIN + N_TEST])
    write_idx_gz(os.path.join(out, "t10k-labels-idx1-ubyte.gz"),
                 labels[N_TRAIN:N_TRAIN + N_TEST])
    print("wrote", out)


if __name__ == "__main__":
    main()
