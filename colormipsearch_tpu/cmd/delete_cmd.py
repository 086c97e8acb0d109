"""deleteCDMatches command: bulk delete matches by filter
(cmd/DeleteCDMatchesCmd.java:46-354)."""

from __future__ import annotations

import argparse
import logging
import os

from ..dataio import (DataSourceParam, JSONNeuronMatchesReader,
                      JSONNeuronMatchesWriter, ScoresFilter)
from .args import add_common_args

LOG = logging.getLogger(__name__)


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("deleteCDMatches", help="bulk delete matches")
    add_common_args(p)
    p.add_argument("-md", "--matchesDir", default=None)
    p.add_argument("--db", default=None)
    p.add_argument("--masks-mip-ids", nargs="*", default=None)
    p.add_argument("--max-matching-pixels", type=int, default=None,
                   help="delete matches with matchingPixels below this")
    p.add_argument("--dry-run", action="store_true")
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> int:
    if args.db:
        return _run_db(args)
    reader = JSONNeuronMatchesReader(args.matchesDir)
    selector = DataSourceParam(mip_ids=args.masks_mip_ids or [])
    n_deleted = 0
    for mip_id in reader.list_match_locations([selector]):
        path = os.path.join(args.matchesDir, f"{mip_id}.json")
        matches = reader.read_matches_by_mask(DataSourceParam(mip_ids=[mip_id]))
        if args.max_matching_pixels is not None:
            keep = [m for m in matches
                    if (m.matching_pixels or 0) >= args.max_matching_pixels]
        else:
            keep = []
        n_deleted += len(matches) - len(keep)
        if args.dry_run:
            continue
        if keep:
            JSONNeuronMatchesWriter(args.matchesDir).write(keep)
        else:
            os.remove(path)
    LOG.info("%s %d matches", "would delete" if args.dry_run else "deleted",
             n_deleted)
    return 0


def _run_db(args: argparse.Namespace) -> int:
    """DB path: SQL-side delete (DeleteCDMatchesCmd's bulk delete)."""
    from .backends import get_store
    store = get_store(args.db)
    refs = None
    if args.masks_mip_ids:
        from ..dataio import DataSourceParam
        masks = store.find_neurons(DataSourceParam(mip_ids=args.masks_mip_ids))
        refs = [e.entity_id for e in masks]
    if args.dry_run:
        LOG.info("dry run: would delete matches (mask refs=%s, max pixels=%s)",
                 refs, args.max_matching_pixels)
        return 0
    n = store.delete_matches(mask_refs=refs,
                             max_pixels=args.max_matching_pixels)
    LOG.info("deleted %d matches", n)
    return 0
