"""Sinks (SURVEY §2.6): versioned-collection writers (Qdrant/Milvus
pattern), JSON snapshot sink (S3 pattern), passthrough knowledge-base
uploaders (Wonderful/ElevenLabs/Decagon pattern).

All share the reference's atomic-publish protocol: write to a NEW version,
flip an alias, retire old versions — never mutate a live collection.
"""
