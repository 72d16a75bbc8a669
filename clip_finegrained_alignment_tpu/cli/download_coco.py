"""COCO 2017 downloader (replaces ``/root/reference/coco_downloader.py``):
streams and extracts the annotation/train/val zips with progress reporting
and resume-safe skip-if-present behavior. Network-gated — prints a clear
message in zero-egress environments.

    python -m clip_finegrained_alignment_tpu.cli.download_coco \
        --output-dir dataset/coco --splits annotations val2017
"""

from __future__ import annotations

import argparse
import os
import zipfile

URLS = {
    "annotations":
        "http://images.cocodataset.org/annotations/"
        "annotations_trainval2017.zip",
    "train2017": "http://images.cocodataset.org/zips/train2017.zip",
    "val2017": "http://images.cocodataset.org/zips/val2017.zip",
}


def download_and_extract(url: str, output_dir: str,
                         chunk_size: int = 1 << 20) -> None:
    import requests

    os.makedirs(output_dir, exist_ok=True)
    zip_path = os.path.join(output_dir, os.path.basename(url))
    if not os.path.exists(zip_path):
        print(f"downloading {url}")
        with requests.get(url, stream=True, timeout=60) as r:
            r.raise_for_status()
            total = int(r.headers.get("content-length", 0))
            done = 0
            with open(zip_path + ".part", "wb") as f:
                for chunk in r.iter_content(chunk_size):
                    f.write(chunk)
                    done += len(chunk)
                    if total:
                        print(f"\r  {done / total:6.1%}", end="",
                              flush=True)
        os.replace(zip_path + ".part", zip_path)
        print()
    print(f"extracting {zip_path}")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(output_dir)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output-dir", default="dataset/coco")
    p.add_argument("--splits", nargs="+", default=["annotations",
                                                   "val2017"],
                   choices=sorted(URLS))
    args = p.parse_args(argv)
    for split in args.splits:
        try:
            download_and_extract(URLS[split], args.output_dir)
        except Exception as e:
            print(f"FAILED {split}: {e} (no network egress? stage COCO "
                  f"manually under {args.output_dir})")
            raise SystemExit(1)


if __name__ == "__main__":
    main()
