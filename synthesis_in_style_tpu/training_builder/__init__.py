from synthesis_in_style_tpu.training_builder.base import BaseTrainBuilder
from synthesis_in_style_tpu.training_builder.doc_ufcn_builder import (
    DocUFCNTrainBuilder,
)


def get_train_builder_class(config):
    """Architecture dispatch (reference
    training_builder/train_builder_selection.py:7-18)."""
    network = config["network"]
    if network == "DocUFCN":
        return DocUFCNTrainBuilder
    if network == "TransUNet":
        from synthesis_in_style_tpu.training_builder.trans_u_net_builder import (
            TransUNetTrainBuilder,
        )

        return TransUNetTrainBuilder
    if network == "EMANet":
        from synthesis_in_style_tpu.training_builder.ema_net_builder import (
            EMANetTrainBuilder,
        )

        return EMANetTrainBuilder
    if network == "PixelEnsemble":
        from synthesis_in_style_tpu.training_builder.pixel_ensemble_builder import (
            PixelEnsembleTrainBuilder,
        )

        return PixelEnsembleTrainBuilder
    raise NotImplementedError


__all__ = ["BaseTrainBuilder", "DocUFCNTrainBuilder", "get_train_builder_class"]
