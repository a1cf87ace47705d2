"""Large-scale training-data pipeline operators (beyond-reference surface,
per BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal columns. All DataFrame-native; Python appears only in
Arrow-batched UDFs where built-ins genuinely cannot express the op.
"""
