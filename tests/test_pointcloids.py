"""pointcloids debug viewer: numpy RANSAC + standalone HTML output."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_pointcloids_cli(tmp_path):
    out = tmp_path / "cloud.html"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "pointcloids.py"),
         "--synthetic", "--stride", "8", "--ransac_iters", "200",
         "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "plane normal" in r.stdout
    html = out.read_text()
    assert "pointcloids" in html and "orbit" in html
    # the synthetic table plane must be recovered (z-dominant normal)
    normal_line = [l for l in r.stdout.splitlines() if "plane normal" in l][0]
    assert "inliers" in normal_line
