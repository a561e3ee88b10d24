"""Source connectors: CSV ingest with dialect sniffing, landing-dir
cache, monthly->daily extraction."""
