from .snparray import PackedGenotypes, maf, grm
from .plink import SnpData, read_plink, write_plink_bed, merge_plink

__all__ = ["PackedGenotypes", "SnpData", "read_plink", "write_plink_bed", "merge_plink", "maf", "grm"]
