"""Interactive segment viewer CLI (parity: reference plotting.py:127-179).

    python -m s2tpu.cli.plot <aoi> <label_map> [--data-dir DIR]
"""

from __future__ import annotations

import argparse

from s2tpu.configs.data_config import AOIs, LABEL_MAPS
from s2tpu.plotting import interactive_viewer


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("aoi", choices=list(AOIs))
    p.add_argument("labels", choices=list(LABEL_MAPS))
    p.add_argument("--data-dir", default=None)
    args = p.parse_args(argv)
    interactive_viewer(args.aoi, args.labels, data_dir=args.data_dir)


if __name__ == "__main__":
    main()
