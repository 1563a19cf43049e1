"""Iterative algorithm drivers + materialization pipeline (SURVEY.md §2.7).

The reference delegates these to Neo4j GDS (shared-memory, single machine);
here they are driver-side loops over DataFrame jobs — each iteration is one
declarative Spark job, with localCheckpoint() between iterations to cut
lineage (SURVEY.md §4).
"""
