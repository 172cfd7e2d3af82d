"""Stream codecs: entropy framing, header and quality coding.

Re-design of the reference's codec layer ([R] gatb-core
tools/compression/{RangeCoder,HeaderCoder}.{hpp,cpp}; SURVEY.md §2.2).
The serial adaptive range coder becomes parallel-friendly framed streams
(raw/zlib/rANS, FORMAT.md §7); the header tokenizer/field-delta codec and
the lossy quality transform keep the reference's behavior contract.
"""
