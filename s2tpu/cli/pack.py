"""Pack a GeoTIFF dataset for TPU-rate input.

Two formats:
  * memmap (default): two monolithic .npy arrays — the hot path
    (zero-copy gathers, native C++ crop gather, device-corpus upload).
  * sharded: .s2rec sharded records (s2tpu.data.records) — corpora beyond
    single-memmap practicality; optional per-record zlib compression.

    python -m s2tpu.cli.pack <aoi> <label_map> [--data-dir DIR] [--out DIR]
        [--format memmap|sharded] [--compress] [--records-per-shard N]
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
    p.add_argument("--format", default="memmap", choices=["memmap", "sharded"])
    p.add_argument("--compress", action="store_true", help="sharded: zlib per record")
    p.add_argument("--records-per-shard", type=int, default=512)
    args = p.parse_args(argv)

    source = TiffSource(args.aoi, args.labels, data_dir=args.data_dir)
    out = (
        Path(args.out)
        if args.out
        else DataDirs(args.aoi, args.labels, data_dir=args.data_dir).base_path / "packed" / args.labels
    )
    if args.format == "sharded":
        from s2tpu.data.records import write_sharded_records

        packed = write_sharded_records(
            source, out, records_per_shard=args.records_per_shard, compress=args.compress
        )
        n_shards = len(packed.meta["shards"])
        print(f"Packed {len(packed)} segments -> {out} ({n_shards} shards, compress={args.compress})")
        return
    packed = pack_dataset(source, out)
    print(f"Packed {len(packed)} segments -> {out}")


if __name__ == "__main__":
    main()
