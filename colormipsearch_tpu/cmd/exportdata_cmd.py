"""exportData command: NeuronBridge-style JSON export.

Counterpart of cmd/ExportData4NBCmd.java + cmd/dataexport/*.java. Result
types (cmd/ExportedResultType.java:3-12): EM_CD_MATCHES, LM_CD_MATCHES,
EM_PPP_MATCHES, EM_MIPS, LM_MIPS. Per mask: read matches, keep the best
match per (maskMIP, targetMIP) pair by normalizedScore
(AbstractCDMatchesExporter.selectBestMatchPerMIPPair,
cmd/dataexport/AbstractCDMatchesExporter.java:108-125), convert entities
to export metadata (dto/AbstractNeuronMetadata.java fields), and write
grouped ResultMatches JSON.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List

from ..dataio import DataSourceParam
from ..model import CDMatchEntity, NeuronEntity
from .args import add_common_args

LOG = logging.getLogger(__name__)

EXPORT_TYPES = ("EM_CD_MATCHES", "LM_CD_MATCHES", "EM_PPP_MATCHES",
                "EM_MIPS", "LM_MIPS")


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("exportData", help="export for NeuronBridge")
    add_common_args(p)
    p.add_argument("--exported-result-type", required=True,
                   choices=EXPORT_TYPES)
    p.add_argument("-md", "--matchesDir", default=None,
                   help="per-mask matches dir (CD/PPP matches export)")
    p.add_argument("--db", default=None,
                   help="read matches from this SQLite store")
    p.add_argument("--mips-file", default=None, help="MIP JSON (MIPs export)")
    p.add_argument("--default-relative-url-index", type=int, default=-1,
                   help="path component the relative URLs start at "
                        "(ExportData4NBCmd.java:115-117; -1 = keep absolute)")
    p.add_argument("--relative-url-indexes-by-filetype", nargs="*",
                   default=[], metavar="FILETYPE=INDEX[,nonhttp]",
                   help="per-FileType URL index overrides "
                        "(ExportData4NBCmd.java:119-123)")
    p.add_argument("--default-image-store", default=None,
                   help="default NeuronBridge image store "
                        "(ExportData4NBCmd.java:162)")
    p.add_argument("--image-stores-per-neuron-meta", nargs="*", default=[],
                   metavar="ALIGNMENTSPACE[:LIBRARY]=STORE",
                   help="image store overrides keyed by alignment space "
                        "and optional library (ExportData4NBCmd.java:165-172)")
    p.add_argument("--published-urls", default=None,
                   help="published-URLs JSON (publishedURLs collection "
                        "shape: [{id, uploaded:{cdm, cdm_thumbnail, ...}}]); "
                        "merged into exported files maps "
                        "(ColorDepthMIP.updateEMNeuron/updateLMNeuron)")
    p.add_argument("--published-lm-stacks", default=None,
                   help="published LM stacks JSON keyed by slideCode "
                        "(publishedLMImages analogue; sets "
                        "VisuallyLosslessStack / Gal4Expression)")
    p.add_argument("--size", type=int, default=-1,
                   help="cap matches per mask")
    p.set_defaults(func=run)


REQUIRED_EXPORT_ATTRS = ("mipId", "libraryName", "publishedName",
                         "alignmentSpace")


def neuron_metadata(e: NeuronEntity, url_transformer=None,
                    image_store_mapping=None, published_urls=None,
                    published_lm_stacks=None) -> Dict:
    """Entity -> export metadata (entity.metadata() analogue;
    dto/AbstractNeuronMetadata.java:43-61). When transformers are given,
    file URLs are relativized per FileType and the FileType.store entry
    is set from the image-store mapping (AbstractDataExporter.java:76-84,
    applied BEFORE any library-name remap so the mapping keys on the
    internal library name)."""
    d: Dict = {"mipId": e.mip_id,
               "libraryName": e.library_name,
               "publishedName": e.published_name,
               "alignmentSpace": e.alignment_space}
    for attr, key in (("gender", "gender"),
                      ("anatomical_area", "anatomicalArea"),
                      ("objective", "objective"),
                      ("slide_code", "slideCode"),
                      ("neuron_type", "neuronType"),
                      ("neuron_instance", "neuronInstance")):
        v = getattr(e, attr, None)
        if v is not None:
            d[key] = v.name if hasattr(v, "name") and attr == "gender" else v
    if e.neuron_terms:
        d["neuronTerms"] = list(e.neuron_terms)
    files = {t.name: v for t, v in sorted(e.files.items(),
                                          key=lambda kv: kv[0].name)} \
        if e.files else {}
    if published_urls:
        from .dataexport import apply_published_urls
        uploaded = published_urls.get(str(e.entity_id)) \
            or published_urls.get(e.mip_id or "")
        if uploaded:
            files = apply_published_urls(
                files, uploaded, type(e).__name__.startswith("EM"))
    if published_lm_stacks and not type(e).__name__.startswith("EM"):
        from .dataexport import apply_published_lm_stacks
        stacks = published_lm_stacks.get(
            str(getattr(e, "slide_code", None) or "")) \
            or published_lm_stacks.get(e.mip_id or "")
        if stacks:
            files = apply_published_lm_stacks(files, stacks)
    if image_store_mapping is not None:
        files["store"] = image_store_mapping.get_image_store(
            e.alignment_space, e.library_name)
    if url_transformer is not None:
        files = {t: (url_transformer.relativize_url(t, v)
                     if t != "store" else v)
                 for t, v in files.items()}
    if files:
        d["files"] = files
    d["type"] = ("EMImage" if type(e).__name__.startswith("EM") else "LMImage")
    return d


def build_transformers(args):
    """CLI args -> (URLTransformer, ImageStoreMapping|None, publishedURLs)
    (ExportData4NBCmd.java:285-293,399-407)."""
    from .dataexport import (URLTransformer, load_published_urls,
                             parse_file_type_indexes,
                             parse_image_store_mapping)
    url_t = URLTransformer(
        args.default_relative_url_index,
        parse_file_type_indexes(args.relative_url_indexes_by_filetype))
    store_m = None
    if args.default_image_store:
        store_m = parse_image_store_mapping(
            args.default_image_store, args.image_stores_per_neuron_meta)
    urls = None
    if getattr(args, "published_urls", None):
        urls = load_published_urls(args.published_urls)
    lm_stacks = None
    if getattr(args, "published_lm_stacks", None):
        from .dataexport import load_published_lm_stacks
        lm_stacks = load_published_lm_stacks(args.published_lm_stacks)
    return url_t, store_m, urls, lm_stacks


def validate_export_metadata(d: Dict) -> List[str]:
    """Required-attribute validation (the reference rejects exports with
    missing attrs via Jackson ValidatingSerializer,
    dto/WithAllRequiredAttrs / cmd/dataexport; here invalid records are
    skipped with an error report)."""
    return [k for k in REQUIRED_EXPORT_ATTRS if not d.get(k)]


def select_best_match_per_mip_pair(matches: List[CDMatchEntity]
                                   ) -> List[CDMatchEntity]:
    """Dedupe (maskMIP, targetMIP) pairs keeping max normalizedScore
    (AbstractCDMatchesExporter.java:108-125; first wins on ties)."""
    best: Dict = {}
    for m in matches:
        if m.normalized_score is None:
            continue
        key = (m.mask_image.mip_id if m.mask_image else None,
               m.matched_image.mip_id if m.matched_image else None)
        cur = best.get(key)
        if cur is None or m.normalized_score > cur.normalized_score:
            best[key] = m
    out = list(best.values())
    out.sort(key=lambda m: -(m.normalized_score or 0))
    return out


def _export_cd_matches(args, by_target: bool) -> int:
    """CD matches export. EM side groups per mask mip
    (EMCDMatchesExporter); LM side groups per TARGET mip with the
    match direction inverted — inputImage is the LM target, results
    are the EM masks (LMCDMatchesExporter over readMatchesByTarget)."""
    from .backends import matches_reader
    reader = matches_reader(args.db, args.matchesDir)
    url_t, store_m, pub_urls, lm_stacks = build_transformers(args)
    out_dir = args.output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    if by_target:
        locations = reader.list_target_locations([DataSourceParam()])
    else:
        locations = reader.list_match_locations([DataSourceParam()])
    for mip_id in locations:
        if by_target:
            matches = reader.read_matches_by_target(
                DataSourceParam(mip_ids=[mip_id]))
        else:
            matches = reader.read_matches_by_mask(
                DataSourceParam(mip_ids=[mip_id]))
        selected = select_best_match_per_mip_pair(matches)
        if args.size > 0:
            selected = selected[:args.size]
        if not selected:
            continue

        def input_of(m):
            return m.matched_image if by_target else m.mask_image

        def matched_of(m):
            return m.mask_image if by_target else m.matched_image

        input_meta = neuron_metadata(input_of(selected[0]), url_t, store_m,
                                     pub_urls, lm_stacks)
        missing = validate_export_metadata(input_meta)
        if missing:
            LOG.warning("skipping export for %s: missing attrs %s",
                        mip_id, missing)
            continue
        results = []
        for m in selected:
            image_meta = neuron_metadata(matched_of(m), url_t, store_m,
                                         pub_urls, lm_stacks)
            if validate_export_metadata(image_meta):
                LOG.warning("skipping match in %s: missing attrs %s",
                            mip_id, validate_export_metadata(image_meta))
                continue
            r = {"image": image_meta,
                 "mirrored": m.mirrored,
                 "normalizedScore": m.normalized_score,
                 "matchingPixels": m.matching_pixels}
            if m.match_files:
                r["files"] = {t.name: v for t, v in m.match_files.items()}
            results.append(r)
        doc = {"inputImage": input_meta, "results": results}
        with open(os.path.join(out_dir, f"{mip_id}.json"), "w") as f:
            json.dump(doc, f, indent=2)
        n += len(results)
    LOG.info("exported %d matches", n)
    return 0


def _export_mips(args) -> int:
    from ..dataio import JSONCDMIPsReader
    reader = JSONCDMIPsReader(args.mips_file)
    url_t, store_m, pub_urls, lm_stacks = build_transformers(args)
    entities = reader.read_mips(DataSourceParam())
    out_dir = args.output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    by_name: Dict[str, List] = {}
    for e in entities:
        by_name.setdefault(e.published_name or "unknown", []).append(e)
    for name, group in by_name.items():
        doc = {"results": [neuron_metadata(e, url_t, store_m, pub_urls, lm_stacks)
                           for e in group]}
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(doc, f, indent=2)
    LOG.info("exported %d MIPs in %d files", len(entities), len(by_name))
    return 0


def _export_ppp_matches(args) -> int:
    out_dir = args.output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    if args.db:
        # DB-backed PPP export (EMPPPMatchesExporter over the pppMatches
        # collection)
        from .backends import get_store
        store = get_store(args.db)
        for em_name in store.list_ppp_em_names():
            matches = store.find_ppp_matches_by_em(em_name)
            if args.size > 0:
                matches = matches[:args.size]
            if not matches:
                continue
            doc = {"inputImage": (matches[0].mask_image.to_dict()
                                  if matches[0].mask_image else None),
                   "results": [m.to_dict() for m in matches]}
            with open(os.path.join(out_dir, f"{em_name}.json"), "w") as f:
                json.dump(doc, f, indent=2)
            n += len(matches)
        LOG.info("exported %d PPP matches", n)
        return 0
    for fname in sorted(os.listdir(args.matchesDir)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(args.matchesDir, fname)) as f:
            doc = json.load(f)
        results = doc.get("results", [])
        if args.size > 0:
            results = results[:args.size]
        out = {"inputImage": doc.get("inputImage"), "results": results}
        with open(os.path.join(out_dir, fname), "w") as f:
            json.dump(out, f, indent=2)
        n += len(results)
    LOG.info("exported %d PPP matches", n)
    return 0


def run(args: argparse.Namespace) -> int:
    t = args.exported_result_type
    if t in ("EM_CD_MATCHES", "LM_CD_MATCHES"):
        if not args.matchesDir and not args.db:
            LOG.error("--matchesDir or --db required for %s", t)
            return 1
        return _export_cd_matches(args, by_target=(t == "LM_CD_MATCHES"))
    if t == "EM_PPP_MATCHES":
        if not args.matchesDir and not args.db:
            LOG.error("--matchesDir or --db required for %s", t)
            return 1
        return _export_ppp_matches(args)
    if not args.mips_file:
        LOG.error("--mips-file required for %s", t)
        return 1
    return _export_mips(args)
