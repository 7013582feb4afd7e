#!/bin/bash
# Download the ADE20K scene parsing dataset (~1GB).
wget http://data.csail.mit.edu/places/ADEchallenge/ADEChallengeData2016.zip
unzip ADEChallengeData2016.zip -d data/
rm ADEChallengeData2016.zip
