"""Dataset curation filters (reference: dataset/filters/*).

Pipeline order (reference dataset/README.md): topology bins -> 3-view
dedup -> length -> thickness -> thinness. Each stage reads/writes id-list
JSONs so stages compose and resume.
"""
