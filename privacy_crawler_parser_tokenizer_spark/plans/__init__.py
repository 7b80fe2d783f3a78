"""Driver-orchestrated multi-round plans (frontier crawl) and plan
introspection helpers."""
