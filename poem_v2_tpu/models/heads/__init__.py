from .ptemb_head import MergeFeaturesMV, POEMGeneralizedHead, generate_bps_basis
