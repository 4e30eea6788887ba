#!/bin/bash
cd /root/repo
echo "=== text family 1000x (graft-base fix) start $(date) ===" > /root/repo/soak_r18c.log
GRAFT_SOAK_ONLY=text sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 1000" >> /root/repo/soak_r18c.log 2>&1
echo "=== emb family 100x start $(date) ===" >> /root/repo/soak_r18c.log
GRAFT_SOAK_ONLY=emb sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 100" >> /root/repo/soak_r18c.log 2>&1
echo "=== all done $(date) ===" >> /root/repo/soak_r18c.log
