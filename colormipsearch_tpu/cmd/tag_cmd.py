"""tag command: bulk add/remove tags on neuron metadata
(cmd/TagNeuronMetadataCmd.java:20-121)."""

from __future__ import annotations

import argparse
import logging

from ..dataio import DataSourceParam, JSONCDMIPsReader, JSONCDMIPsWriter
from .args import add_common_args

LOG = logging.getLogger(__name__)


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("tag", help="bulk tag neuron metadata")
    add_common_args(p)
    p.add_argument("--mips-file", required=True)
    p.add_argument("--tag", nargs="+", required=True)
    p.add_argument("--remove", action="store_true")
    p.add_argument("--library", nargs="*", default=[])
    p.add_argument("--names", nargs="*", default=[])
    p.add_argument("--mip-ids", nargs="*", default=[])
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> int:
    selector = DataSourceParam(libraries=args.library, names=args.names,
                               mip_ids=args.mip_ids)
    reader = JSONCDMIPsReader(args.mips_file)
    all_entities = reader.read_mips(DataSourceParam())
    n = 0
    for e in all_entities:
        if not selector.matches_entity(e):
            continue
        for tag in args.tag:
            if args.remove:
                for tags in e.processed_tags.values():
                    tags.discard(tag)
                e.dataset_labels.discard(tag)
            else:
                e.dataset_labels.add(tag)
        n += 1
    w = JSONCDMIPsWriter(args.mips_file)
    w.open()
    w.write(all_entities)
    w.close()
    LOG.info("%s %d entities", "untagged" if args.remove else "tagged", n)
    return 0
