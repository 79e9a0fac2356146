"""Column-expression helper families (text shingles, vector math)."""
