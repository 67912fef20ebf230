"""Runnable pipelines mirroring the reference's five configurations
(BASELINE.json `configs`): RGBD, RGBD+ICP, stereo, monocular, distributed SfM."""
