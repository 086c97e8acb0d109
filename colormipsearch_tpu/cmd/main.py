"""CLI dispatcher.

Counterpart of cmd/Main.java:25-97: one multi-command entry point. Run as
`python -m colormipsearch_tpu <command> ...`.
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="colormipsearch-tpu",
        description="TPU-native color depth MIP search tools")
    parser.add_argument("-v", "--verbose", action="store_true")
    subparsers = parser.add_subparsers(dest="command")

    from . import (colordepthsearch_cmd, gradientscores_cmd, normalize_cmd,
                   createdatainput_cmd, importppp_cmd, exportdata_cmd,
                   tag_cmd, copymips_cmd, validate_cmd, delete_cmd)
    for mod in (colordepthsearch_cmd, gradientscores_cmd, normalize_cmd,
                createdatainput_cmd, importppp_cmd, exportdata_cmd,
                tag_cmd, copymips_cmd, validate_cmd, delete_cmd):
        mod.add_parser(subparsers)
    return parser


def main(argv: Optional[List[str]] = None) -> int:
    import os
    if os.environ.get("CMS_PLATFORM"):
        # explicit platform pin (NB the axon TPU plugin overrides the
        # JAX_PLATFORMS env var, so the config API is the only reliable way)
        import jax
        try:
            jax.config.update("jax_platforms", os.environ["CMS_PLATFORM"])
        except Exception:
            pass
    parser = build_parser()
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s - %(message)s")
    if not args.command:
        parser.print_help()
        return 1
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
