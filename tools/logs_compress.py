"""Archive run directories, keeping metrics + exported policies and dropping
bulky checkpoints.

Counterpart of reference tools/logs_compress.py:5-52 (tar.zst keeping events +
exported, excluding *.pt). Checkpoints here are orbax directories (model_*).

Usage: python tools/logs_compress.py logs/go2_moe_cts [-o archive.tar.gz]
"""
import argparse
import os
import tarfile


def should_keep(path: str) -> bool:
    parts = path.split(os.sep)
    if any(p.startswith("model_") for p in parts):
        return False
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log_dir")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    out = args.output or args.log_dir.rstrip("/") + ".tar.gz"
    n = 0
    with tarfile.open(out, "w:gz") as tar:
        for root, dirs, files in os.walk(args.log_dir):
            dirs[:] = [d for d in dirs if not d.startswith("model_")]
            for fname in files:
                full = os.path.join(root, fname)
                if should_keep(full):
                    tar.add(full, arcname=os.path.relpath(
                        full, os.path.dirname(args.log_dir)))
                    n += 1
    print(f"wrote {out} ({n} files; checkpoints excluded)")


if __name__ == "__main__":
    main()
