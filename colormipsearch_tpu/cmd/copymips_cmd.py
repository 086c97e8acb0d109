"""copyToMipsStore command: copy/normalize MIP files into a canonical
store layout (cmd/CopyToMIPsStore.java:65-344)."""

from __future__ import annotations

import argparse
import logging
import os
import shutil

from ..dataio import DataSourceParam, JSONCDMIPsReader, JSONCDMIPsWriter
from ..model import ComputeFileType, FileData
from ..mips import load_image_from_filedata
from .args import add_common_args

LOG = logging.getLogger(__name__)

# canonical store sub-layout per compute file type
_SUBDIRS = {
    ComputeFileType.SourceColorDepthImage: "",
    ComputeFileType.InputColorDepthImage: "searchable_neurons",
    ComputeFileType.GradientImage: "grad",
    ComputeFileType.ZGapImage: "zgap",
}


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("copyToMipsStore",
                              help="copy MIPs into a canonical store layout")
    add_common_args(p)
    p.add_argument("--mips-file", required=True)
    p.add_argument("--target-folder", required=True)
    p.add_argument("--update-mips", action="store_true",
                   help="rewrite the MIP JSON pointing at the new store")
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> int:
    reader = JSONCDMIPsReader(args.mips_file)
    entities = reader.read_mips(DataSourceParam())
    n = 0
    for e in entities:
        for cft, subdir in _SUBDIRS.items():
            fd = e.compute_files.get(cft)
            if fd is None:
                continue
            dest_dir = os.path.join(args.target_folder, subdir)
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, fd.name_component)
            if fd.entry_name:
                # extract zip entries into the flat store
                img = load_image_from_filedata(fd)
                if img is None:
                    continue
                import zipfile
                with zipfile.ZipFile(fd.file_name) as zf, \
                        open(dest, "wb") as out:
                    out.write(zf.read(fd.entry_name))
            else:
                if not os.path.exists(fd.file_name):
                    continue
                shutil.copy2(fd.file_name, dest)
            if args.update_mips:
                e.compute_files[cft] = FileData.from_string(dest)
            n += 1
    if args.update_mips:
        w = JSONCDMIPsWriter(args.mips_file)
        w.open()
        w.write(entities)
        w.close()
    LOG.info("copied %d files into %s", n, args.target_folder)
    return 0
