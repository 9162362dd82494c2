"""Offline dataprep: MS MARCO subsampling + embedding (host-side)."""
