"""Generate the checked-in miniature TUM RGB-D dataset (tests/data/mini_tum).

20 frames of the synthetic revisit sequence written in the exact TUM
directory layout (rgb.txt / depth.txt / groundtruth.txt, 8-bit gray PNGs,
16-bit depth PNGs with factor 5000) so the TUM loader, the native PNG
decoder, the associate pairing and the end-to-end System path can be
exercised without network access — the zero-egress stand-in for
fr1/desk-style evaluation (BASELINE.md runbook). Pure-python PNG encoder:
no imaging library is baked into the image.

Usage: python tools/make_mini_tum.py [--out tests/data/mini_tum] [--frames 20]
"""

import argparse
import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEPTH_FACTOR = 5000.0


def write_png_gray(path: str, arr: np.ndarray):
    """Minimal PNG encoder for 8-bit / 16-bit grayscale (big-endian rows,
    filter 0) — matches what the native decoder (vendored-libpng-free
    dataset_loader.cc) and OpenCV read back bit-exactly."""
    h, w = arr.shape
    if arr.dtype == np.uint16:
        bit_depth, row_bytes = 16, arr.astype(">u2")
    else:
        assert arr.dtype == np.uint8
        bit_depth, row_bytes = 8, arr

    raw = b"".join(b"\x00" + row_bytes[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(chunk(b"IEND", b""))


def rot_to_quat_xyzw(R):
    """Rotation matrix -> (x, y, z, w) quaternion (TUM trajectory order)."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2
    y = np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2
    z = np.sqrt(max(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2
    x = np.copysign(x, R[2, 1] - R[1, 2])
    y = np.copysign(y, R[0, 2] - R[2, 0])
    z = np.copysign(z, R[1, 0] - R[0, 1])
    return x, y, z, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "mini_tum"))
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD

    cfg = SlamConfig(sensor=SENSOR_RGBD)
    ds = SyntheticRGBD(cfg, n_frames=args.frames, seed=0, trajectory="orbit")

    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(args.frames):
        gray, depth = ds[i]
        ts = ds.timestamps[i]
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.where(depth > 0,
                       np.clip(np.round(depth * DEPTH_FACTOR), 0, 65535),
                       0).astype(np.uint16)
        rgb_rel = f"rgb/{ts:.6f}.png"
        d_rel = f"depth/{ts:.6f}.png"
        write_png_gray(os.path.join(args.out, rgb_rel), g8)
        write_png_gray(os.path.join(args.out, d_rel), d16)
        rgb_lines.append(f"{ts:.6f} {rgb_rel}")
        depth_lines.append(f"{ts:.6f} {d_rel}")
        R_wc, c_w = ds.gt_pose_wc(i)
        qx, qy, qz, qw = rot_to_quat_xyzw(R_wc)
        gt_lines.append(f"{ts:.6f} {c_w[0]:.6f} {c_w[1]:.6f} {c_w[2]:.6f} "
                        f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")

    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(args.out, name), "w") as f:
            f.write(f"# mini synthetic TUM sequence ({args.frames} frames)\n")
            f.write("# timestamp data\n")
            f.write("\n".join(lines) + "\n")
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
