"""Driver-level plans: the crawl round loop + snapshot state store."""
