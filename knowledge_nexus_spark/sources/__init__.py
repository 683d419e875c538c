"""Source connectors: adapters from external table shapes into the
engine's interleaved-span document schema (SURVEY.md §2.1 scans)."""
