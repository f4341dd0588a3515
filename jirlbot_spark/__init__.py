"""jirlbot_spark — a from-scratch, PySpark-native rebuild of the capabilities
of RovoMe/JIRLbot (an IRLbot-architecture web crawler).

Not a port: DRUM's disk-bucket/merge machinery becomes bucketed DataFrame
joins, STAR/BEAST become windowed aggregations and salted per-PLD admission,
and the crawl loop is a driver-orchestrated, checkpoint-resumable microbatch
pipeline over Parquet/Iceberg tables of image+caption pair records.

Semantics sources: the IRLbot paper (Lee/Leonard/Wang/Loguinov, WWW 2008)
and BASELINE.json's north rule. /root/reference was empty at build time
(SURVEY.md §0), so reference citations are paper-level.
"""

__version__ = "0.1.0"
