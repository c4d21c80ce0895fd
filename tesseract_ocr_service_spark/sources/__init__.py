"""Sources & sinks: the deterministic synthetic Common-Crawl-style corpus
generator and the partitioned pages reader/writer."""
