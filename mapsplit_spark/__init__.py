"""mapsplit_spark — a from-scratch PySpark-native spatial tiling + join
engine with the query/data semantics of simonpoole/mapsplit, rebuilt for
Iceberg/parquet tables of image+caption rows at 10^12 scale.

Not a port: the reference is a single-JVM two-pass streaming program;
this engine declares the same semantics as DataFrame plans (scan →
columnar tile assignment → shuffle-by-tile → partitioned write) and lets
Catalyst/Tungsten pick physical strategies.
"""

__version__ = "0.1.0"
