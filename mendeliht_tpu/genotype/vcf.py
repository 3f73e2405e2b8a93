"""Minimal VCF reader (genotypes GT or dosages DS) — replaces the reference's
VCFTools.convert_gt / convert_ds path (reference src/wrapper.jl:452-461).

Produces a dense float matrix (n, p) with NaN for missing, plus variant
metadata. Standardization is applied by the caller (utils/wrapper.py) with the
same genotype-specific sigma = sqrt(mu(1-mu/2)) the reference uses."""

from __future__ import annotations

import gzip

import numpy as np


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def read_vcf(path: str, dosage: bool = False):
    """Returns (G (n,p) float64 with NaN missing, sample_ids, chr, pos, ids,
    ref, alt)."""
    samples = None
    cols = []
    chrs, poss, ids, refs, alts = [], [], [], [], []
    with _open(path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                continue
            if samples is None:
                raise ValueError(f"{path}: missing #CHROM header")
            parts = line.rstrip("\n").split("\t")
            chrom, pos, vid, ref, alt = parts[0], parts[1], parts[2], parts[3], parts[4]
            fmt = parts[8].split(":")
            key = "DS" if dosage else "GT"
            try:
                fidx = fmt.index(key)
            except ValueError:
                raise ValueError(f"{path}: FORMAT has no {key} field")
            row = np.empty(len(samples))
            for i, cell in enumerate(parts[9:]):
                fields = cell.split(":")
                val = fields[fidx] if fidx < len(fields) else "."
                if dosage:
                    row[i] = np.nan if val in (".", "") else float(val)
                else:
                    if val in (".", "./.", ".|."):
                        row[i] = np.nan
                    else:
                        a = val.replace("|", "/").split("/")
                        try:
                            row[i] = sum(0 if x == "0" else 1 for x in a if x != ".")
                            if "." in a:
                                row[i] = np.nan
                        except ValueError:
                            row[i] = np.nan
            cols.append(row)
            chrs.append(chrom)
            poss.append(int(pos))
            ids.append(vid)
            refs.append(ref)
            alts.append(alt)
    G = np.stack(cols, axis=1) if cols else np.zeros((len(samples or []), 0))
    return (G, np.array(samples), np.array(chrs), np.array(poss),
            np.array(ids), np.array(refs), np.array(alts))
