"""validateDBData command: consistency checks of entities vs files
(cmd/ValidateNBDBDataCmd.java:49-370)."""

from __future__ import annotations

import argparse
import json
import logging
import os

from ..dataio import DataSourceParam, JSONCDMIPsReader
from ..model import ComputeFileType

LOG = logging.getLogger(__name__)

from .args import add_common_args


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("validateDBData",
                              help="validate entities vs files on disk")
    add_common_args(p)
    p.add_argument("--mips-file", default=None)
    p.add_argument("--db", default=None,
                   help="validate neurons from this store instead of a "
                        "JSON file")
    p.add_argument("--required-compute-files", nargs="*",
                   default=["InputColorDepthImage"])
    p.add_argument("--check-file-existence", action="store_true")
    p.add_argument("--error-report", default=None)
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> int:
    if not args.mips_file and not args.db:
        LOG.error("--mips-file or --db required")
        return 1
    if args.db:
        from .backends import get_store
        entities = get_store(args.db).find_neurons(DataSourceParam())
    else:
        entities = JSONCDMIPsReader(args.mips_file).read_mips(
            DataSourceParam())
    errors = []
    required = [ComputeFileType.from_name(n)
                for n in args.required_compute_files]
    for e in entities:
        eid = e.mip_id or str(e.entity_id)
        if not e.published_name:
            errors.append({"entity": eid, "error": "missing publishedName"})
        for cft in required:
            fd = e.compute_files.get(cft)
            if fd is None:
                errors.append({"entity": eid,
                               "error": f"missing compute file {cft.name}"})
            elif args.check_file_existence and not os.path.exists(fd.file_name):
                errors.append({"entity": eid,
                               "error": f"file not found: {fd.file_name}"})
    LOG.info("validated %d entities: %d errors", len(entities), len(errors))
    if args.error_report:
        with open(args.error_report, "w") as f:
            json.dump(errors, f, indent=2)
    for err in errors[:50]:
        LOG.warning("%s: %s", err["entity"], err["error"])
    return 1 if errors else 0
