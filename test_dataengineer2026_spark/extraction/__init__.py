"""The reference spec's document-extraction pipeline (X1-X9).

PDF corpus -> per-page text -> four fixed-schema nullable tables
(projects, mineral_resources, mineral_reserves, economics) per
/root/reference/TEST_TECNICO_INGENIERO_DATOS.md:26-59.
"""
