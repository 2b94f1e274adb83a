"""Distributed operators: SQL/DataFrame-expressed RLE algebra and the
RleFrame keyed-collection API."""
