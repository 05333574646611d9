"""sdg_engine — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query/data-processing capabilities of the
geotrellis/geotrellis-road-distance-sdg pipeline (Rural Access Index,
SDG 9.1.1) as an idiomatic PySpark DataFrame engine over tables of
image + caption rows (see /root/repo/SURVEY.md).

Provenance note: the reference checkout at /root/reference is empty in
this sandbox (SURVEY.md §0), so reference citations in docstrings are
given as the SURVEY.md operator ids (C1, J1, A2, ...) that map to the
reference's recalled structure, not file:line into /root/reference.

Nothing here is a port: cell indexing, geometry kernels, image codecs
and the distance transform are written from scratch in numpy and run
as vectorized pandas/Arrow UDFs; everything relational is plain
pyspark.sql DataFrame code optimized by Catalyst.
"""

__version__ = "0.1.0"

WORLD_MIN = 0.0  # lon/lat lower bound of the plate-carrée world (FIXTURES.md)
WORLD_SIZE = 10.0  # degrees per axis
METERS_PER_DEG = 111320.0  # plate-carrée scale used for all distances
