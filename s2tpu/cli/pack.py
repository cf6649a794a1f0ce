"""Pack a GeoTIFF dataset into memory-mapped arrays for TPU-rate input.

    python -m s2tpu.cli.pack <aoi> <label_map> [--data-dir DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from s2tpu.configs.data_config import AOIs, LABEL_MAPS, DataDirs
from s2tpu.data.dataset import TiffSource, pack_dataset


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("aoi", choices=list(AOIs))
    p.add_argument("labels", choices=list(LABEL_MAPS))
    p.add_argument("--data-dir", default=None)
    p.add_argument("--out", default=None, help="default: <data>/<aoi>/packed/<label_map>")
    args = p.parse_args(argv)

    source = TiffSource(args.aoi, args.labels, data_dir=args.data_dir)
    out = (
        Path(args.out)
        if args.out
        else DataDirs(args.aoi, args.labels, data_dir=args.data_dir).base_path / "packed" / args.labels
    )
    packed = pack_dataset(source, out)
    print(f"Packed {len(packed)} segments -> {out}")


if __name__ == "__main__":
    main()
