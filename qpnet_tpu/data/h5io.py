"""HDF5 feature I/O — same on-disk schema as the reference
(`/world`, `/f0`, `/npow`, `/vad_idx`, `/world/mean`, `/world/scale`;
reference src/utils/utils.py:23-128)."""

from __future__ import annotations

import logging
import os
import sys

import h5py
import numpy as np


def read_hdf5(hdf5_name: str, hdf5_path: str) -> np.ndarray:
    if not os.path.exists(hdf5_name):
        logging.error("there is no such a hdf5 file. (%s)", hdf5_name)
        sys.exit(1)
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            logging.error("there is no such a data in hdf5 file. (%s in %s)",
                          hdf5_path, hdf5_name)
            sys.exit(1)
        return f[hdf5_path][()]


def write_hdf5(hdf5_name: str, hdf5_path: str, write_data,
               is_overwrite: bool = True) -> None:
    write_data = np.asarray(write_data)
    dirname = os.path.dirname(hdf5_name)
    if dirname and not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)
    with h5py.File(hdf5_name, "a") as f:
        if hdf5_path in f:
            if is_overwrite:
                del f[hdf5_path]
            else:
                logging.error("dataset in hdf5 file already exists. (%s)",
                              hdf5_path)
                sys.exit(1)
        f.create_dataset(hdf5_path, data=write_data)


def check_hdf5(hdf5_name: str, hdf5_path: str) -> bool:
    if not os.path.exists(hdf5_name):
        return False
    with h5py.File(hdf5_name, "r") as f:
        return hdf5_path in f


def shape_hdf5(hdf5_name: str, hdf5_path: str):
    with h5py.File(hdf5_name, "r") as f:
        return f[hdf5_path].shape
