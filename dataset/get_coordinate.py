"""Extract ROI coordinates from a .mat (HDF5) recording.

Parity with ``/root/reference/dataset/dg/get_coordinate.py:8-27``: reads the
``data`` ROI reference table and prints each ROI's ``mnCoordinates`` (the
first 2 ROIs are skipped, matching the 2 dropped neurons elsewhere in the
pipeline). Uses ``[()]`` reads (the ``.value`` accessor was removed in
h5py 3).
"""

import argparse
import os

import h5py


def get_coordinate(filename: str):
    if not os.path.exists(filename):
        print(f"file {filename} does not exists")
        exit()

    coordinates = []
    with h5py.File(filename, "r") as f:
        rois = f["data"][()]
        for roi in rois[2:]:
            coordinates.append(f[roi[0]]["mnCoordinates"][()])

    print(coordinates)
    return coordinates


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--filename", default="raw_data/MC_20181117_P01.mat",
                        type=str)
    get_coordinate(filename=parser.parse_args().filename)
