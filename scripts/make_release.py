"""Build a release artifact: wheel + sdist-style bundle with the flagship
model and docs (the TPU-host equivalent of the reference's Windows installer
pipeline, installer/build_all.ps1 + make_windows_installer.iss: package the
app, its entry points, and a trained model into one distributable).

    python scripts/make_release.py [--out dist]

Produces:
  dist/beats3d_tpu-<ver>-py3-none-any.whl   (pip-installable, console scripts)
  dist/beats3d-tpu-<ver>-bundle.tar.gz      (wheel + flagship model + docs)
"""
import argparse
import glob
import os
import subprocess
import sys
import tarfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dist")
    args = ap.parse_args()
    out = os.path.join(ROOT, args.out)
    os.makedirs(out, exist_ok=True)

    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", out, ROOT],
        check=True,
    )
    wheels = sorted(glob.glob(os.path.join(out, "beats3d_tpu-*.whl")))
    assert wheels, "wheel build produced nothing"
    wheel = wheels[-1]

    ver = os.path.basename(wheel).split("-")[1]
    bundle = os.path.join(out, f"beats3d-tpu-{ver}-bundle.tar.gz")
    with tarfile.open(bundle, "w:gz") as tf:
        tf.add(wheel, arcname=os.path.basename(wheel))
        for rel in ("README.md", "COMPONENTS.md", "models/flagship"):
            p = os.path.join(ROOT, rel)
            if os.path.exists(p):
                tf.add(p, arcname=rel)
    print(f"release: {wheel}")
    print(f"release: {bundle}")


if __name__ == "__main__":
    main()
