"""Assemble STREAM_FINE_r{N}.json from streamed-training logs.

Parses the supervisor/run log(s) for the `[stream] level N done, rss=` /
`[coarse]` / `[fine]` / `[layered]` lines plus supervisor attempt markers,
and writes the per-level RSS record the round ships alongside the model
artifacts (reference economy being matched: compressed_blocks.py:106,158).

Usage: python scripts/stream_record.py OUT.json LOG [LOG...]
"""
import json
import re
import sys


def parse(paths):
    rec = {
        "attempts": 0,
        "wedge_kills": 0,
        "coarse": None,
        "fine": None,
        "levels_rss_gb": [],
        "resumes": [],
        "layered": None,
        "compression": None,
    }
    lvl_re = re.compile(r"\[stream\] level (\d+) done, rss=([\d.]+)G")
    for path in paths:
        with open(path) as f:
            for line in f:
                if "[supervisor] attempt" in line:
                    rec["attempts"] += 1
                if "log stale" in line:
                    rec["wedge_kills"] += 1
                if "[ckpt] resuming" in line:
                    rec["resumes"].append(line.strip())
                m = lvl_re.search(line)
                if m:
                    rec["levels_rss_gb"].append(
                        [int(m.group(1)), float(m.group(2))]
                    )
                if line.startswith("[stream] dataset compression"):
                    rec["compression"] = line.split(":", 1)[1].strip()
                for key in ("coarse", "fine", "layered"):
                    if line.startswith(f"[{key}]"):
                        rec[key] = line.strip()
    return rec


def main():
    out, logs = sys.argv[1], sys.argv[2:]
    rec = parse(logs)
    rec["what"] = (
        "fine D=16 T=4 layer trained END-TO-END with TRUE per-use "
        "streaming (B3D_V2_STREAM_FINE=1, RLE blocks decoded on device); "
        "per-candidate-tree checkpoints + wedge watchdog "
        "(train_forest checkpoint_dir / scripts/train_supervised.sh) make "
        "the run survive this rig's wedging axon RPCs, resuming with the "
        "rng stream intact — the committed model artifacts ARE this run's "
        "output"
    )
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}: {len(rec['levels_rss_gb'])} level records, "
          f"{rec['attempts']} attempts, {rec['wedge_kills']} wedge kills")


if __name__ == "__main__":
    main()
