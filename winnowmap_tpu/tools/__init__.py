"""Analysis utilities mirroring the reference's scripts/ directory
(reference scripts/minimizerDist.R, scripts/extractSelectedReads.R)."""
