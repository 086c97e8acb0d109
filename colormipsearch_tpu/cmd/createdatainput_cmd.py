"""createColorDepthSearchDataInput command: build MIP input JSON.

Counterpart of cmd/CreateCDSDataInputCmd.java:58-798. Two sources:
- local MIP stores (directories/zips): entities built from the CDM files
  with variant resolution by naming convention (the reference's indexed
  MIPsHandlingUtils lookup)
- JACS REST (--jacs-url): paged /colorDepthMIPsWithSamples retrieval
  (requires network; unavailable in air-gapped deployments)
"""

from __future__ import annotations

import argparse
import logging
import os
import re
from typing import Optional

from ..dataio import JSONCDMIPsWriter
from ..model import (ComputeFileType, EMNeuronEntity, FileData, Gender,
                     LMNeuronEntity)
from ..persist import TimebasedIdGenerator
from .args import add_common_args
from .mipstores import (extract_channel, extract_em_body_id,
                        extract_lm_slide_code, extract_objective,
                        index_mip_stores, is_em_library, list_store_images,
                        lookup_variant_images)

LOG = logging.getLogger(__name__)

# variant type name -> ComputeFileType (CreateCDSDataInputCmd.java:111-127)
DEFAULT_VARIANT_MAPPING = {
    "cdm": ComputeFileType.InputColorDepthImage,
    "searchable_neurons": ComputeFileType.InputColorDepthImage,
    "segmentation": ComputeFileType.InputColorDepthImage,
    "grad": ComputeFileType.GradientImage,
    "gradient": ComputeFileType.GradientImage,
    "zgap": ComputeFileType.ZGapImage,
    "rgb": ComputeFileType.ZGapImage,
    "junk": ComputeFileType.JunkImage,
}


def add_parser(subparsers) -> None:
    p = subparsers.add_parser(
        "createColorDepthSearchDataInput",
        help="build MIP input JSON from local stores or JACS")
    add_common_args(p)
    p.add_argument("--library", required=True,
                   help="library name (flyem*/flywire* => EM)")
    p.add_argument("--alignment-space", "-as", default="JRC2018_Unisex_20x_HR")
    p.add_argument("--cdm-location", nargs="+", default=[],
                   help="dir(s)/zip(s) with source CDM images")
    p.add_argument("--variant", action="append", default=[],
                   help="variant spec '<type>:<location>' (grad:…, zgap:…, searchable_neurons:…)")
    p.add_argument("--included-published-names", nargs="*", default=[],
                   help="only import these published names "
                        "(CreateCDSDataInputCmd.java:150)")
    p.add_argument("--excluded-neurons", nargs="*", default=[],
                   help="skip these neuron names "
                        "(CreateCDSDataInputCmd.java:162)")
    p.add_argument("--jacs-url", default=None)
    p.add_argument("--authorization", default=None)
    p.add_argument("--output-filename", default=None)
    p.set_defaults(func=run)


def _entity_for_image(name: str, args, idgen) -> Optional[object]:
    stem = re.sub(r"\..*$", "", os.path.basename(name))
    em = is_em_library(args.library)
    if em:
        body_id = extract_em_body_id(stem)
        e = EMNeuronEntity()
        e.published_name = body_id or stem
    else:
        slide_code = extract_lm_slide_code(stem)
        e = LMNeuronEntity()
        e.slide_code = slide_code
        e.published_name = stem.split("-")[0] if "-" in stem else stem
        e.objective = extract_objective(stem, args.alignment_space)
        gm = re.search(r"[-_]([mf])[-_]", stem)
        e.gender = Gender.from_val(gm.group(1)) if gm else None
    e.entity_id = idgen.generate_id()
    e.mip_id = str(e.entity_id)
    e.alignment_space = args.alignment_space
    e.library_name = args.library
    return e


def run(args: argparse.Namespace) -> int:
    if args.jacs_url:
        return _run_jacs_import(args)
    em = is_em_library(args.library)
    idgen = TimebasedIdGenerator()

    variant_locations = {}
    for v in args.variant:
        vtype, _, loc = v.partition(":")
        ftype = DEFAULT_VARIANT_MAPPING.get(vtype.lower())
        if ftype is None:
            LOG.warning("unknown variant type %s", vtype)
            continue
        variant_locations.setdefault(ftype, []).append(loc)
    variant_indexes = {ftype: index_mip_stores(locs, em)
                       for ftype, locs in variant_locations.items()}

    included = set(args.included_published_names or [])
    excluded = set(args.excluded_neurons or [])
    entities = []
    for loc in args.cdm_location:
        for entry in list_store_images(loc):
            e = _entity_for_image(entry.entry_name, args, idgen)
            if e is None:
                continue
            # include/exclude filters
            # (CreateCDSDataInputCmd.java:150,162,365-380)
            if included and e.published_name not in included:
                continue
            if excluded and (e.published_name in excluded
                             or (e.neuron_id or "") in excluded):
                continue
            e.compute_files[ComputeFileType.SourceColorDepthImage] = entry.file_data()
            # default searchable image = the source CDM itself unless a
            # segmented variant is found
            e.compute_files[ComputeFileType.InputColorDepthImage] = entry.file_data()
            nid = e.neuron_id or ""
            ch = extract_channel(entry.entry_name)
            obj = extract_objective(entry.entry_name, args.alignment_space)
            for ftype, index in variant_indexes.items():
                found = lookup_variant_images(nid, index, em, ch, obj,
                                              args.alignment_space)
                if found:
                    e.compute_files[ftype] = found[0].file_data()
            entities.append(e)

    out = args.output_filename or os.path.join(
        args.output_dir or ".", f"{args.library.replace(' ', '_')}.json")
    w = JSONCDMIPsWriter(out)
    w.open()
    w.write(entities)
    w.close()
    LOG.info("wrote %d entities to %s", len(entities), out)
    return 0


def _run_jacs_import(args) -> int:
    """Paged JACS REST import (CreateCDSDataInputCmd.java:249-260,
    646-678) through the typed client (jacs/client.py): full sample /
    em-body metadata mapping, retries, auth header."""
    from ..jacs import JacsClient, em_neuron_from_mip, lm_neuron_from_mip

    idgen = TimebasedIdGenerator()
    em = is_em_library(args.library)
    client = JacsClient(args.jacs_url, authorization=args.authorization)
    try:
        mips = client.retrieve_color_depth_mips_with_samples(
            args.library, args.alignment_space)
    except RuntimeError as e:
        LOG.error("JACS request failed: %s", e)
        return 1
    entities = []
    for mip in mips:
        e = (em_neuron_from_mip(mip, args.library, args.alignment_space)
             if em else
             lm_neuron_from_mip(mip, args.library, args.alignment_space))
        e.entity_id = idgen.generate_id()
        entities.append(e)
    out = args.output_filename or os.path.join(
        args.output_dir or ".", f"{args.library.replace(' ', '_')}.json")
    w = JSONCDMIPsWriter(out)
    w.open()
    w.write(entities)
    w.close()
    LOG.info("imported %d entities from JACS to %s", len(entities), out)
    return 0
