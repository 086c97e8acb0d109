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
    p.add_argument("--mips-file", default=None)
    p.add_argument("--db", default=None,
                   help="tag neurons in this store instead of a JSON file")
    p.add_argument("--tag", nargs="+", required=True)
    p.add_argument("--remove", action="store_true")
    p.add_argument("--library", nargs="*", default=[])
    p.add_argument("--names", nargs="*", default=[])
    p.add_argument("--mip-ids", nargs="*", default=[])
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> int:
    if not args.mips_file and not args.db:
        LOG.error("--mips-file or --db required")
        return 1
    selector = DataSourceParam(libraries=args.library, names=args.names,
                               mip_ids=args.mip_ids)
    store = None
    if args.db:
        from .backends import get_store
        store = get_store(args.db)
        all_entities = store.find_neurons(DataSourceParam())
    else:
        all_entities = JSONCDMIPsReader(args.mips_file).read_mips(
            DataSourceParam())
    n = 0
    for e in all_entities:
        if not selector.matches_entity(e):
            continue
        # the reference tags the neuron's `tags` field
        # (TagNeuronMetadataCmd.java:20-121 over
        # AbstractNeuronEntity.tags)
        for tag in args.tag:
            if args.remove:
                e.tags.discard(tag)
            else:
                e.tags.add(tag)
        n += 1
    if store is not None:
        store.upsert_neurons(all_entities)
    else:
        w = JSONCDMIPsWriter(args.mips_file)
        w.open()
        w.write(all_entities)
        w.close()
    LOG.info("%s %d entities", "untagged" if args.remove else "tagged", n)
    return 0
