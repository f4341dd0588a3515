"""Query/plan layer: the driver-orchestrated microbatch crawl loop with
atomic multi-table commits and exact checkpoint-resume."""
