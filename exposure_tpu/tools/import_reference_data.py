"""Import dataset artifacts from an existing exposure checkout.

Users switching from the reference implementation typically already have
its ``data/`` tree (folds, artist sets, FiveK packs).  This tool links or
copies those *dataset artifacts* (not code) into this repo's layout so no
re-download is needed.

Usage: python -m exposure_tpu.tools.import_reference_data \
           /path/to/exposure [--data-root .] [--copy]
"""

import argparse
import os
import shutil

ARTIFACT_DIRS = [
    'data/folds',
    'data/artists',
    'data/fivek_dataset',
]


def import_data(reference_root, data_root='.', copy=False):
    imported = []
    for rel in ARTIFACT_DIRS:
        src = os.path.join(reference_root, rel)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(data_root, rel)
        if os.path.exists(dst):
            print('exists, skipping:', dst)
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if copy:
            shutil.copytree(src, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
        imported.append(rel)
    return imported


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('reference_root')
    parser.add_argument('--data-root', default='.')
    parser.add_argument('--copy', action='store_true',
                        help='copy instead of symlink')
    args = parser.parse_args()
    imported = import_data(args.reference_root, args.data_root, args.copy)
    print('imported:', imported or 'nothing (all present or source empty)')


if __name__ == '__main__':
    main()
