from .unet import NBP, nbp_loss
