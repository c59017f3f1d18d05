"""acousticbrainz_server_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of metabrainz/acousticbrainz-server.

Brand-new, Spark-first implementation (DataFrame/SQL + Catalyst); the reference
(read-only at /root/reference/) defines WHAT to compute, not how.  See SURVEY.md
for the operator inventory this package covers.
"""

__version__ = "0.1.0"
