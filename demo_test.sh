#!/bin/bash
# Demo: download the canonical checkpoint + a test image, run inference.
# Counterpart of the reference demo_test.sh (ckpt ResNet50dilated + PPM_deepsup).

MODEL_PATH=ckpt/ade20k-resnet50dilated-ppm_deepsup
RESULT_PATH=./

ENCODER=$MODEL_PATH/encoder_epoch_20.pth
DECODER=$MODEL_PATH/decoder_epoch_20.pth

mkdir -p $MODEL_PATH
if [ ! -e $ENCODER ]; then
  wget -P $MODEL_PATH http://sceneparsing.csail.mit.edu/model/pytorch/ade20k-resnet50dilated-ppm_deepsup/encoder_epoch_20.pth
fi
if [ ! -e $DECODER ]; then
  wget -P $MODEL_PATH http://sceneparsing.csail.mit.edu/model/pytorch/ade20k-resnet50dilated-ppm_deepsup/decoder_epoch_20.pth
fi
if [ ! -e ADE_val_00001519.jpg ]; then
  wget http://sceneparsing.csail.mit.edu/data/ADEChallengeData2016/images/validation/ADE_val_00001519.jpg
fi

python3 -u test.py \
  --imgs ADE_val_00001519.jpg \
  --cfg config/ade20k-resnet50dilated-ppm_deepsup.yaml \
  DIR $MODEL_PATH \
  TEST.result $RESULT_PATH \
  TEST.checkpoint epoch_20.pth
