"""Conformance anchor: decode reference-encoder streams bit-exactly.

The golden streams in tests/data were produced by the reference encoder
(vvencFFapp, options in tests/data/golden_options.txt).  Our subset decoder
must reconstruct them bit-exactly (hashes below were computed from the
reference encoder's own --ReconFile output).  Since the decoder shares all
derivation/reconstruction code with our encoder, this pins the shared model
to the spec.
"""

import hashlib
import os

import numpy as np
import pytest

from vvenc_tpu.decoder import decode_stream

DATA = os.path.join(os.path.dirname(__file__), "data")

# md5 of frame planes (uint16 LE, Y then U then V concatenated) from the
# reference encoder's reconstruction output
GOLDEN_HASHES = {
    # transform skip: TSRC residual coding (forward scan, neighbor level
    # prediction, context-coded signs, budgeted passes), TS dequant
    "golden_ai_ts_416x240_qp30_f2.266": [
        "1417b50cfadd4b0480aed2b334a70f44",
        "0496e763bb74112f3119d8f43a509c17"],
    # BDPCM luma+chroma: DPCM prediction/residual accumulation, special
    # cbf/sign contexts, HOR/VER intra mode mapping
    "golden_ai_bdpcm_416x240_qp30_f2.266": [
        "e7456398f38d406fa38ec992a4589b79",
        "2530c2c353e1d85117a6a53348b6a6ee"],
    # IBC: block-vector merge/AMVP + HMVP-IBC, skip in I slices,
    # truncated-BV chroma copy, dual-tree chroma BS derivation
    "golden_ai_ibc_416x240_qp30_f2.266": [
        "7b468e4a6140efa0127a048a14636e47",
        "e43490114f858c952d9519a29062a7a0"],
    # all SCC tools together (IBC + TS + BDPCM)
    "golden_ai_scc_416x240_qp30_f2.266": [
        "b5d44d8b512ee2bdc50a5f745fdaa171",
        "5dc7394e7a7491759e544fefcd58c420"],
    # SCC tools in random-access inter slices (+AMVR)
    "golden_ra_scc_416x240_qp30_f6.266": [
        "c2cdcdcff4cd57b637dba638f885a34a",
        "af729ff1a8f282944f49649b7db97a91",
        "a585992fc3d81d072fbd16db74267726",
        "5ef5b1b01680459dba2a0eb7d34dfad0",
        "5b50638b129e96e2caa5982aa960fe75",
        "a6c08d42773b98614d54e1ca10894eab"],
    # SBT (sub-block transform): half/quad splits, position-dependent
    # DCT2 (sps_mts off), per-TU cbf/deblock geometry incl. chroma TUs
    "golden_ra_sbt_416x240_qp27_f9.266": [
        "9dfdba46a1799a7f4278d56fe63f98b4",
        "d9f773e239c46e9e2928114a73c7e8d2",
        "9def2955a7530614fa16a161da8ede96",
        "99d1b9fbee4dd56f063ec8a05d06c9fb",
        "a3b48b2f8c109dac7610aa49397d6ed8",
        "d4162dd42bb31fcd25c802b72a2d8d29",
        "3e0827c81696a8fcd05db3f18bbaa11a",
        "e67f119153e61ed979f50fecc8a16107",
        "cf840acea73b0492c166e5b6a241cea1"],
    # SBT with sps_mts on: position-dependent DST7/DCT8 transform pairs
    "golden_ra_sbt_mts_416x240_qp27_f9.266": [
        "82f9653726d3316ad33d28e0d64954ee",
        "21070999b060b238a8c4d4b19cdeb984",
        "14ac86bc6bcc727e8ee86e2ec73aadba",
        "bf13031cfd68fa4f803ec6f02a617516",
        "7908b6aa3ba42e4b7bffcd14c3fcdab0",
        "584da516c22e82d778d21aba10e78561",
        "5cb79f8360b53c58adcfe2be72c0c0fe",
        "e7b14166b3c3f608a2e98c4d1c48a0d4",
        "88fa024a1b6697f381b6f7e3f56c84bf"],
    # SBT + DepQuant + JCCR + TMVP + MMVD + GEO + CIIP
    "golden_ra_sbt_combo_416x240_qp24_f9.266": [
        "86eb66c2dc80b5daa5158c7fafe4c61f",
        "f547aacefd47ffefe409832c84547719",
        "111c020a1149162bb3ffa564ffcbe4b9",
        "983f389786afd0c0caf062fb59ea307b",
        "78b7d00d78a86517a37d51b65cfbf938",
        "84cbc909489fe863d7ccadd067c740ac",
        "3a58f628fa6723f5d036898179e03400",
        "5e50281e545cf7f85c2c1313db5cb23c",
        "4555bad988df9e1a689bc15e006d2bcf"],
    # ISP (intra sub-partitions): 1/2/4-wide TUs, 1-D transforms, implicit
    # DST7, per-partition reference samples, internal TU deblock edges
    "golden_ai_isp_416x240_qp24_f2.266": [
        "124ce24a2d3941f1e0635d09efadba0e",
        "00b2f559027c48947ea9440e0bdc5f3d"],
    # ISP + LFNST (CU-dim wide-angle mapping) + implicitMTS + MIP + MRL
    # + CCLM + JCCR
    "golden_ai_isp_combo_416x240_qp24_f2.266": [
        "70aca559b7ac1f75908a07731f4b7a7c",
        "ce1984a2b71f3f809cd573e7ec741c77"],
    # ISP (mode 3) inside random-access inter slices
    "golden_ra_isp_416x240_qp27_f9.266": [
        "2bdc0151181d9a19b7a4bd8b94f72b61",
        "820a64b0d3b5d1d25eb720658c3eb7a9",
        "4201980e504a354f5a0084fbfc77ccc8",
        "56043ef04a43d3ccabce7d17216bfb97",
        "cf3ab79672ea9c75e6179aa39cf54363",
        "c89fb1a765fa3337aae7938886d57456",
        "68e0f915c3b13f003e4ff367d3320bf1",
        "e67f119153e61ed979f50fecc8a16107",
        "47a528563924c60f2cebc827c090ca33"],
    # GEO (geometric partitioning merge): 64 split modes, uni candidate
    # extraction, weighted blend, per-4x4 motion storage
    "golden_ra_geo_416x240_qp28_f9.266": [
        "75ffc65c9eecb601e07e30ffcbe8a0e9",
        "a3566100a34382dc0e4451f325d5e256",
        "9267ade9621263c7ea41dcb367eef1e2",
        "c974c97383be5da8a58e96836a3d2127",
        "925fb59b456f10ab222bd43ac19ead14",
        "ed3ea4e590cbc0e492873fd3b5c7c66d",
        "0359210d4ff775d88b81d6d75fd2372b",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "4f41409c304df8990bc0006d2805f195"],
    # CIIP (combined inter/intra): planar blend with neighbor-adaptive
    # weights, BS 2 deblocking
    "golden_ra_ciip_416x240_qp28_f9.266": [
        "ad1e517fa03f71eeb45fa30a854761da",
        "139439e04f81446f751b57c1ee4a643f",
        "3c2b890af0e41f0a02ab2656008403c5",
        "5d220ae54e36a71f44352e0aef390ef6",
        "10a5f4fb59522378ed7c37546de06955",
        "59cec2c16ca4d1859582696bfd0b8dd7",
        "db50d2e7d3b04afb26ecfd88c9dd4745",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "4f41409c304df8990bc0006d2805f195"],
    # GEO + CIIP + MMVD: regular_merge_flag / ciip_flag interplay
    "golden_ra_geo_ciip_mmvd_416x240_qp28_f9.266": [
        "a86a3a27cac627d97dc851434ede4f93",
        "dcd5ecb009ed73e2948592fc7b1af19f",
        "dde5f22e17ff0553a05db4aba854b62b",
        "ae8a78f8340aca3284c4bd29025aca48",
        "28528c8e21375184e5a160934a3c0b87",
        "35868c8bf295a6f61beed5c4b5b43056",
        "a9ca3eea6b7a692b655beed74d13a134",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "65e2f5bda9fb25d0fdf2258bb0f9f424"],
    # the full inter tool sink + GEO + CIIP: every implemented inter tool
    # plus CCLM/implicitMTS/MIP/MRL/LFNST/JCCR/DepQuant/ALF/CCALF/SAO
    "golden_ra_ultimate_416x240_qp27_f9.266": [
        "3952b76e7ec390429921f827de54d417",
        "3ab0544b2773a5b3cb5e15ea412c7bda",
        "75f3bd249dbeaa8355e2944e39c7eeb2",
        "00ada8fe8ebac2dbdc9a12d1ab1a38a8",
        "41661270e676c0beb92bd6ae9ded6a7f",
        "b6561d4e8d3ac17802e4735d22c9d5bd",
        "1348a845d9cd46642a101d2de95f08d9",
        "58168bf49b363d9fa28c324743dc74e7",
        "862127228ff9fb21bf181b3dfdbfeb53"],
    # affine motion (4+6 param, --Affine 1), no PROF, rotating/zooming clip
    "golden_ra_affine_416x240_qp28_f9.266": [
        "5fcbe10a964f972bb7838367fcb12f2a",
        "4f3c4691a77f89cbfb3edcc1d25dcb77",
        "61a90382b93031d40ae5c535fe3acca4",
        "1ddb0aabdecdda90120f49eeabb348fe",
        "23d16f0681eeb89e307041fa708b8cb0",
        "907dbb19eee603d7e64d7dd59609afd2",
        "38a39b84a69796646932dd6b07d95aae",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "2ab4fe3c36069f74ca4b8d18a4508f0e"],
    # affine + PROF (prediction refinement with optical flow)
    "golden_ra_affine_prof_416x240_qp28_f9.266": [
        "dd5bee4330ae062c64aa6d9d0f44d8c0",
        "607c4ea9432432455f0b462921a3ab14",
        "88168fe05a3675d016383bedf4cc3c4a",
        "990acc1c97cab2d20dea3e2198c800a5",
        "35ba6551f9900b0ad13e96b5ea664b41",
        "3a489c96654a655b5ab5971b0d0f896d",
        "434b6c74fc86e6a3a62159855fe2421b",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "25f100f9905aa0680c17674060982dbc"],
    # SbTMVP only (subblock merge with maxNumAffineMergeCand == 1)
    "golden_ra_sbtmvp_416x240_qp28_f9.266": [
        "cf7ba50134d3fbf2eee5c97c433c6aa2",
        "87efe4aaceeed3fb99d3006d50a3e0cb",
        "9a7bba3aefb763104d84af55665dfcf1",
        "74a287239bdf9b25ecd8d06113bc2b99",
        "8c1cff79a5ac2aba379c287734075685",
        "49bb5a109b7a8ddbed557d1e6198ac5e",
        "330c0a06feaf3f8779eac2f946f461c7",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "4f41409c304df8990bc0006d2805f195"],
    # affine + SbTMVP + PROF combined (shared subblock merge list)
    "golden_ra_affine_sbtmvp_prof_416x240_qp28_f9.266": [
        "bda84a3b7de4784b3c356d18d2b47891",
        "7e334cab102d946b88e168477881ff77",
        "8c5927d0f638d1c608f09153d99c558c",
        "990acc1c97cab2d20dea3e2198c800a5",
        "e3dc1104d1b82d2a24f8c26e0a4cabe8",
        "8dce33fc8d9eba1ec2397e0e4174692b",
        "3a4483b30d524ec5d6bd5fd37bb19e0a",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "25f100f9905aa0680c17674060982dbc"],
    # 4-parameter-only affine (sps_affine_type_flag == 0) + PROF
    "golden_ra_affine4p_prof_416x240_qp28_f9.266": [
        "ed684172cfe1500ab0f70fcf32e4ccd3",
        "0083e91fb7b29bba0593b08687cf2e34",
        "ad60e5466cf6079eb6708f1fb9a96291",
        "3f83d6f65befbbce98db2690a027912a",
        "f2fe5912262242d42c3d32d4667b96ea",
        "fb47e6f6dd7e1aa64fa42cc6a8530708",
        "8f8a4a3b982d9d402da74cae21294ee9",
        "5ae46b11a70c9dd355cc3becafda7bd4",
        "36ecbf8b0af7c96cbb45960ef5677454"],
    # affine tool sink: affine(5 cands)+SbTMVP+PROF+TMVP+AMVR+MMVD+SMVD
    # +BCW+BDOF+DMVR+DepQuant+CCLM+implicitMTS+MIP+MRL+LFNST+JCCR
    # +ALF+CCALF+SAO
    "golden_ra_affine_toolsink_416x240_qp27_f9.266": [
        "bbd9a0a708c95a8177a09509c967441a",
        "0cd940b70eab42ff9402ee7650708908",
        "bdf318586081f3e278601280f3ffcc92",
        "817bbc89e611a0da8705d0db03af0326",
        "3d5a5796ab9aa960d39442a4b6fc545d",
        "d372aa224e07f19c3dbddc89042cf745",
        "070e043a232c200d9ea81f1b18b55e1c",
        "58168bf49b363d9fa28c324743dc74e7",
        "862127228ff9fb21bf181b3dfdbfeb53"],
    # BDOF + DMVR (decoder-side refinement), RA GOP16
    "golden_ra_bdof_dmvr_416x240_qp28_f9.266": [
        "4da8a433c2b9ce0471f07a16b189f6d6",
        "1022cc5bc826a52412cfa4a8a2e47de6",
        "59770bcdd58ade723bfaf9387b857bc9",
        "adde3a783039045cf91e5501041eee6c",
        "0524b0d925bf2290a7fc756788a30c94",
        "f7f90c456caa903dee0beffa14adbe68",
        "47b1a4c0060c6efe29dc50ddf567c1c4",
        "e5aaf41fe679702f35bce7d3c8d71299",
        "54bfe7bb3d9b9755deeef14e601207eb"],
    # the full inter tool sink: BDOF+DMVR+AMVR+MMVD+SMVD+BCW+TMVP with
    # MIP/MRL/LFNST/implicitMTS/CCLM/JCCR/ALF/CCALF/SAO
    "golden_ra_intersink_416x240_qp27_f9.266": [
        "a39facb2a63209355e803f83f885fc05",
        "ce523e6464a0769312e791b312496228",
        "aa047597804c39b9d952c2c3e705f621",
        "cbe455c5e840c24360c0a8afdb3bccd1",
        "652348ab5f7814947e7db90288024064",
        "58db667462ccbeeddbbdd509425f5c33",
        "9c03c64e14ae346a476e59e1c2ada4dc",
        "2bf67e5039d6c6738043692d9ec723d6",
        "069fa8478d82c28786124778983b9900"],
    # AMVR (incl. half-pel alt interpolation filter), RA GOP16
    "golden_ra_amvr_416x240_qp28_f9.266": [
        "b62d36524775932868b8a504cb0fa3ba",
        "540c979e388fde122d53c9f8964c8d60",
        "7adc27d75228e3dbda098774fa9f637b",
        "fc2f7dd9d42533b3d5482dc4227f68b6",
        "e095a04ad8ef099b48bae2790b48ffe9",
        "7586fc4147a4b9326f873db21e18e727",
        "d2d230dd2a0e6600afb8a8a0eb70ded0",
        "e5aaf41fe679702f35bce7d3c8d71299",
        "6ee753a760c49c8a5113d0e5105e850f"],
    # AMVR + MMVD + SMVD + BCW combined
    "golden_ra_amvr_mmvd_smvd_bcw_416x240_qp28_f9.266": [
        "8c8979ca0e711380d1d8405e907e75a2",
        "fc9976544fbc80220ff4e97a12d084fd",
        "f40cd33a8f164e1793b861162e21671f",
        "9b8904205bbf823b9c085a57f60cfc5d",
        "914d14cc3c897e7b4700ac13f7a8df36",
        "30f701dcd8fb2a8203b780a870ae5237",
        "0f3dfa4db2e23b723bb1941ded527487",
        "e5aaf41fe679702f35bce7d3c8d71299",
        "f5fd0e9817d07afca6dc8e72c02c465d"],
    # joint Cb-Cr residual (JCCR) with ALF+CCALF+SAO, random access GOP16:
    # all three ICT modes, per-picture sign, joint-QP deblocking edges
    "golden_ra_jccr_alf_416x240_qp28_f9.266": [
        "9b533cd5ce5173a3c80f3ad218843b16",
        "5da30858466524da391ec145a97ee62f",
        "15e1156578cf46f9fdb8c026ac643c65",
        "7114ef3b8c7698c140e9c24298bde3ea",
        "9ddd910da5f457c584d14a1fa77e345a",
        "ca008a44e634d9f13db62b9d58bb4195",
        "011362e49ac35cadbc9b00cbbd400a96",
        "a77372e48d6202c149ed393a91cd8df0",
        "1fe07c9d13f2c123135937e7fe30e3c0"],
    # "kitchen sink" intra: MIP+MRL+LFNST+implicitMTS+CCLM+JCCR+ALF+CCALF
    # +SAO+deblock at MTT2
    "golden_ai_sink_416x240_qp26_f2.266": [
        "ba28c1dc450efd68fe753b18bea4def1",
        "657ab78ec133b2db3561ba4919fe0b09"],
    # ALF + CC-ALF + SAO (full in-loop filter chain), busy content
    "golden_ai_alf_ccalf_sao_416x240_qp30_f2.266": [
        "e52985f91a9c89c59fb8a3cc20d04ad5",
        "4bd65148659abbe7af8e3e04921c1045"],
    # non-linear (clipped) ALF luma+chroma
    "golden_ai_alf_nonlinear_416x240_qp30_f2.266": [
        "07a4183eadf227bc2d6a2f042b974207",
        "11be91b062b7ce6e36518289535eff9b"],
    # random access GOP16 with ALF/CC-ALF/SAO: temporal APS reuse across
    # frames, inter slices (busy_moving clip)
    "golden_ra_alf_ccalf_sao_416x240_qp30_f9.266": [
        "8fda25558947f7af16b10103122f8c6c",
        "434773fddfdbd600bd2872a01cc3a75a",
        "6e89dfcabe15a82fed02da19962c4878",
        "3475ab339251cc3aaa9ce831810001f9",
        "cb52842c479cd103e7e9fe6db140aadd",
        "09bfdb42bd2bea32d8befe7e9df9216c",
        "b70609143383d38f94e0ed25f9aa3780",
        "9642207d97295153c1c758356b33fc85",
        "7774f43fda276e2f000ebb811cdd3270"],
    # intra tool streams on busy content (--preset faster tools-off set,
    # CTU64 MTT1, deblocking on, q24, /tmp/busy.yuv): one tool each, plus
    # the combined LFNST+implicitMTS+MIP+MRL stream
    "golden_ai_mip_416x240_qp24_f2.266": [
        "d0027d6ee71ee46c50e5ed6d4a565bcb",
        "bad97a826f994b1af7f43661b7daf71b"],
    "golden_ai_mrl_416x240_qp24_f2.266": [
        "3129d93b7be09faf94732d84272f5158",
        "de5285a3e8ecc933cf3badb5553b5cae"],
    "golden_ai_lfnst_416x240_qp24_f2.266": [
        "5cf145d3f4b0a31afa8973d08fe4220c",
        "91911e649ceded500e6dd22bc2812a5b"],
    "golden_ai_mts_416x240_qp24_f2.266": [
        "34f07657bd9e308af206220352a88ffc",
        "02294a5d9991aebbacccfa1e4e2be519"],
    "golden_ai_combo_416x240_qp24_f2.266": [
        "204957a060d08a1a5cbfbed92ead4118",
        "757a673b1e21b86ded8ecbf2a4b8ce91"],
    "golden_ai_minimal_416x240_qp37_f1.266": [
        "34453c0404da1000c586b0061ce6232b"],
    "golden_ai_qt_416x240_qp37_f3.266": [
        "34453c0404da1000c586b0061ce6232b",
        "9358c1315da835a3e12f234bc1e1cae3",
        "4e3e33a15d84cc4d51676e25ddb929b6"],
    # same config with the deblocking filter enabled (LoopFilterDisable 0)
    "golden_ai_deblock_416x240_qp37_f1.266": [
        "a433431479fcced9d06f19f9124a24a6"],
    # low-delay B (GOP8, generalized B, multi-ref, bi-pred, merge/AMVP/HMVP)
    # moving synthetic content at QP32, inter tools-off config
    "golden_ld_moving_416x240_qp32_f9.266": [
        "e3fe678cf1d3ab169023e10ddfbb49ea",
        "39102296efff1b6c1c3a59216426a504",
        "366b356f9ec5b0a7970a40538e6bfec0",
        "08b15e74102c1e59a321a4c828959c76",
        "04c7fd67dcd53d6e747838f9ead1fb75",
        "a71d0f3fd07d8e8f2ec3eeeb7486e19d",
        "00b09759cd6f0330e0b7b549b264ea18",
        "c7f1b408b9c5c88b7ee746945f71dc4c",
        "d289b8e0fee2f2b97b78d2fe15f6d00e"],
    # SAO + deblocking all-intra (MTT 1, QP32)
    "golden_ai_sao_416x240_qp32_f1.266": ["35ff30ebb9b66d887240a4376cf172ff"],
    # CTU 64 all-intra: 64x64 TBs with the 64-point zero-out
    "golden_ai_ctu64_416x240_qp32_f1.266": [
        "7b4fce5c3458eeabf17ec64f7244ca90"],
    # CTU 64 random access GOP16 with inter-slice MTT (separate SPS
    # partition constraint set), deblocking with motion/cbf boundary
    # strengths, 64-wide/-tall rectangular TBs
    "golden_ra_ctu64_mtt_db_416x240_qp32_f9.266": [
        "253a292d29057d836b98f2fbaeda6ae1",
        "9478a070abb4a2f4c367dc4aeb75e1c7",
        "fafcb53f223c01fea5077c8cc3d74d2f",
        "672471c9b900f5549e6e78185c17face",
        "99531752ac89fc4e82879d27ad373e62",
        "48450bf4babab40c3d30425c5f9b1f79",
        "be592719d5192cdba5ee48049342e90c",
        "c9a18ba22d30f7d0de1adae2ed8d9a13",
        "ce3a39d860c19ae50a51436c96b1d066"],
    # MTT (BT depth 1) all-intra with boundary implicit splits, QP27
    "golden_ai_mtt1_416x240_qp27_f1.266": ["d5e1fb4388b3a4f1fc85dfe4f1bec7b7"],
    # SCIPU / mode constraint (mode_cons_flag, MODE_TYPE_INTER regions),
    # bipred-restricted 4x8/8x4 CUs (no bi bin, merge bi->uni-L0), QP22
    # (hashes verified bit-exact vs the reference --ReconFile output)
    "golden_ra_scipu_416x240_qp22_f9.266": [
        "c744972683dc335e272392a458f879e8",
        "79ff3772b81a5f8dedc599224c3db34c",
        "73895cee745c066424bc6bd27031f91f",
        "f2efc9192189f23dfded6a12ea1675a4",
        "28ef29ed5b98afc4cb43632b19864ef1",
        "fbfe3152115127b60aa4306b6c8e990e",
        "70db540b944ab918cdf100a703d21e3d",
        "917dc523d612a26002f5aa371eed981d",
        "834dfa4e31fbb992dadd094f2b797ce8"],
    # MTT depth 2 random access: 8x2/2x8 chroma coefficient groups, deeper
    # SCIPU nesting, QP24
    "golden_ra_mtt2_416x240_qp24_f9.266": [
        "85f32cddbcb800b050c1ae904859d9a7",
        "c484cc298bc809182accbfb27cc869f9",
        "f4763c1c3b60885b521aad365696ddcf",
        "2ea8e46a58c2dd2d95ebbd99221f920c",
        "0a50f84dbe9794fd7f283e83a3b02e14",
        "eaf65b2aeca40aaa3d4e0c2d5d17e183",
        "1c43c065ac9f9b493249239fd9eec15f",
        "b3372c7f1a937218751d5339471fec8d",
        "c7d01b3243b83a8e8c7d8fa37173d8e1"],
    # low-QP all-intra (dense MTT splits), QP20
    "golden_ai_lowqp_416x240_qp20_f2.266": [
        "1b2ebaa3e7041ea9f11b2d6f6273fd72",
        "ec2ef2f0a775eb665e433f0419748b28"],
    # PerceptQPA all-intra: cu_qp_delta parsing (per-CTU QGs), per-CU-QP
    # dequant + deblocking, slice-level chroma QP offsets
    "golden_ai_qpa_416x240_f2.266": [
        "5ac8fc6379aff80d2c86325caa26056a",
        "41c19c6b573242fcfc85bd4f8371cf47"],
    # PerceptQPA random access GOP16: cu_qp_delta in B slices incl.
    # sub-CTU QGs (cu_qp_delta_subdiv 2 on high temporal layers), the
    # "QP of CUs before the coded delta is the predictor" rule, per-edge
    # deblock QP averaging
    "golden_ra_qpa_416x240_q27_f9.266": [
        "f7ad755e30e8b36bca241d44b2876a65",
        "217f89ecf756e19edc6bed4ca7dc6e6b",
        "6da79f6836d89d352e6edaaf84459e27",
        "ec563d964939f9f807272506aaf1261a",
        "89407fb3078378a5a5bb748039331c8b",
        "d21c8843a7b0af4d30d2f3d17077deac",
        "fad044da0aac32a99df3da03e3d2f994",
        "6b59416bf1897a54c08d9ad5f1afd4f9",
        "cce3ea3b51481e4874da0f5ea6dbac81"],
    # TMVP on (--TMVPMode 1): temporal merge + AMVP candidates, MV scaling,
    # 8x8 temporal motion storage rounding, QP24
    "golden_ra_tmvp_416x240_qp24_f9.266": [
        "cbe8d5d7c39815d6ec254ddbd3a25e8f",
        "168bc05233d3783e93a97ee2de02c137",
        "c1a06d415812ca740ded7e4057bf9154",
        "17b4cc07cfff23b340efdee2bfa0a61f",
        "b1fd1e67334d4a6d0419dd7bbe30383a",
        "a238e8f0e6591636d96dce0f9d8e217f",
        "83df9d6fff1bcd60ef824073062daf6f",
        "b3372c7f1a937218751d5339471fec8d",
        "e8ea2a223ab2244bc60d2a64f770ddb1"],
    # CCLM/MDLM chroma (LMChroma) + TMVP + implicit MTS, QP27
    "golden_ra_cclm_416x240_qp27_f9.266": [
        "261242bf15faaa17964a987498df6a33",
        "a208f9f5ebbff96d2500bf1baf163326",
        "8dac179454a5762c4ced602399859794",
        "aeed38bc53ebe8b7f0565ee1c2d5267f",
        "9fcfc5e4c85d6710e9aac77e4d63430d",
        "0ace7b0c66336b14eae0efd06af14e67",
        "f6057484b4600afa5f4f3fc698ce2fcd",
        "e9f8f3e2b79f9134a04a7aceb145bf1d",
        "4b8c3d83232e57f77690cc02fbe75630"],
    # TMVP + implicit MTS (DST-7 for intra luma TBs 4..16), QP27
    "golden_ra_tmvp_mtsi_416x240_qp27_f9.266": [
        "472793fe7f778fb65b339560aaeea364",
        "e366dbb0fcf74ea27c43a627e4d10646",
        "9547e233386e3b8172ebb43a67d5ac64",
        "65cf188c6901cf1cf1f2fefbeeccc6f0",
        "309a64a292612156d7c96edc0bf76aeb",
        "1018ff8ddfd5135102372d2f78624429",
        "882a4d16ad9bd2679aae90401c75caf0",
        "bf44432471262d51aaeac283f5b7f2d0",
        "0fef807756d2b16dc5138ee05c3e021a"],
    # dependent quantization (--DepQuant 1): 4-state machine threading the
    # sig-flag context set, ZeroPos in the bypass pass, and the dequant
    # reconstruction index (QP+1 quantizer), QP27
    "golden_ra_dq_416x240_qp27_f9.266": [
        "6200a79bda8049154afb163636ab3159",
        "45dcce9283dc9bb5e9517542fff276ea",
        "2160c05d71f9f7efce8f9986ed578fdc",
        "a85fdcec70989754ca3747732bc16639",
        "f9457a1215811f647955262db06e2bcb",
        "1af81293e1fce65535ed92d30fee816e",
        "28b63d42bd5ebc59cc3521708a9244fb",
        "47388383bd8ddefae6447489f004f549",
        "cd1020e7d0a9897fdfff3029ffce541b"],
    # sign-data hiding (--SignHideFlag 1): last-sign inference from CG
    # abs-sum parity when lastNZ-firstNZ >= SBH_THRESHOLD (4), QP27
    "golden_ra_sdh_416x240_qp27_f9.266": [
        "1580b71de9fb1e04d0938207ad3e5cfd",
        "e02369823a0ed99c21759c9411bea1e8",
        "2483df15819d5d49aca9dc56ae884e46",
        "ddb4f75bceb9f6eb63a0a366b94fb6ff",
        "947f2708260136a21835ae54a55e62d9",
        "1f97e6460b3435fbb96b55081f9f4c28",
        "abaefb02dc769754e1dc199c530fb661",
        "56517de0bea8d35cdad6cc544b444ab1",
        "e404b69127fe633683d64316eedfe969"],
    # random access GOP16 (IDR mid-stream, RADL leading pictures, STSA,
    # picture reordering, temporal layers) — hashes in DISPLAY order
    "golden_ra_gop16_416x240_qp32_f9.266": [
        "dd3103071c5e15262486d4fe2e024a01",
        "c69fc7cae988a2a90cd53225a75ae50b",
        "a07f03e1791aa5c243ab15328c89afa1",
        "eb7b219e6b8b14c9dbd0f7d77cee86a8",
        "f650515d6838986b7a15d6f5c841dea7",
        "809223235e51b6c8ad40a1455e0a92d8",
        "29802bdff52fd1f8c4ad26ca94aed36d",
        "1c5546bd82079e21a95108c93d58063e",
        "2917f688314e5d60d974bef702ca7510"],
    # LMCS all-intra: LMCS APS parse, PH lmcs flags, mapped-domain intra
    # coding, chroma residual scaling (VPDU-neighbor chromaAdj), inverse
    # luma mapping before deblocking (lmcs_clip, q27)
    "golden_ai_lmcs_416x240_qp27_f2.266": [
        "34237b8f09b77fe2fda8f158f8b59fb6",
        "8a2c31161c8737298db192a48258f821"],
    # LMCS random access GOP16: forward-mapped inter luma prediction,
    # mapped-domain residual add, inverse mapping before loop filters,
    # chroma scaling in B slices
    "golden_ra_lmcs_416x240_qp27_f9.266": [
        "ad158e3c487c8c0c6771175908fd8b32",
        "590ccda634cc1d9da5012882b184fa2d",
        "2ccc1aa1ec9fc5b430dd437e27c2b7e3",
        "c6bc7659d2921f0c61e211de3429ab93",
        "e42439012ca2e2bea5bc40871debfd35",
        "18237385cf33cd96b71ab54b134ba9c9",
        "d402962422dcec4dbed4293ba743e3dc",
        "3fa58bc37e2497f750735597eb3b6f2b",
        "11782f3af5cc4f160eb41243fb973997"],
    # the full intra+inter tool matrix in one RA stream (DepQuant, LFNST,
    # implicit MTS, MIP/MRL/ISP, CCLM, JCCR, ALF/CC-ALF/SAO, TS/BDPCM/IBC,
    # affine, SbTMVP, AMVR, BDOF/DMVR, MMVD/SMVD/GEO/CIIP/SBT/BCW) —
    # pins tool interactions (ISP chroma TS flags, LFNST-vs-BDPCM cbf
    # gating, narrow-ISP 4-wide prediction regions)
    "golden_ra_fulltools_416x240_qp26_f9.266": [
        "7bffae1c12513497934b62381a193061",
        "7896fa22213da13b5ad49fc9a2da9036",
        "65aa7916119c93bd9b42582c0e1d5e2d",
        "48485b733b8d9c771c6029410f48bf17",
        "7909f48ea7a2fb323867f42d2288b233",
        "061442aa21a4723c540c272d90f384b1",
        "731402d7fe8634ce24eb050a292e19d1",
        "6abf253075bd2ee38bd7c4eabd3d14d4",
        "be695d8ba1f53ab769290609ae6322f8"],
    # tiles: 3x2 all-intra — per-tile CABAC init, entry points, implicit
    # tile-size expansion, availability cut at tile boundaries
    "golden_ai_tiles3x2_416x240_qp27_f2.266": [
        "c9991f85504b5faebe5e9a2d2f4c31f2",
        "63c482187b91229ff5fd5f5e3fdf71d1"],
    # tiles: 2x2 random access GOP16 — inter availability across tile
    # boundaries, HMVP per-tile reset, deblock across tile edges
    "golden_ra_tiles2x2_416x240_qp27_f9.266": [
        "b59aab747961aec854f2d2a4e9bc241b",
        "73a9d971a25849f53c1bb981ac744fb6",
        "dea67cf96643c95a2bfa6024bc19ae19",
        "611620e0a50b50f0740cbd66a27bb42f",
        "a8692df3d4c75ac740025523b5ef885b",
        "c0152642239f2008c0ab5f073a3105c0",
        "45e66b11578fded3259ee69f88a6aaab",
        "5789efb61c8360834dc1e51ffbb0626b",
        "fa426d523e89135b4e26d94947fbd020"],
    # dual-tree intra (DualITree 1, the preset default) with every intra
    # tool (DepQuant/LFNST/MTSImplicit/MIP/MRL/ISP/CCLM/JCCR/ALF/CCALF/
    # SAO/TS/BDPCM/IBC): separate luma/chroma trees, chroma-tree split
    # constraints, dual-tree CCLM gate, CTU64 MTT2
    "golden_ai_dualtree_all_416x240_qp26_f2.266": [
        "4c0ecef511814d33ea3160fb6ea67261",
        "951c100de052d0741d27f98b3694e569"],
    # TRUE PRESET STREAMS (only MCTF/BIM/QPA/threads pinned off): the
    # full vvenc default tool matrices at CTU128 with dual-tree intra
    # and implicit max-TB transform tiling of >64 inter CUs
    "golden_ai_preset_medium_416x240_qp30_f2.266": [
        "f8d80bc7b65ac636cd95dc52e2d5387c",
        "80117a1c3f1563f4f829f3c0546575aa"],
    "golden_ra_preset_medium_416x240_qp30_f9.266": [
        "5f531e05d60b613b87399b4566ec94bb",
        "54a790359736466517d7d8643d2a95a7",
        "219faa6a22f516d3981830006e0b2629",
        "3e4d544784ca3f1eae8c5462f3b7844c",
        "fce03dbd8ec7c3d4ed9ab0df649aa6ab",
        "e4629c24b1cc1095fd88bb9801a16355",
        "e410a8391e945c9e98f5cfb8f9946b5a",
        "946d80b28f707522b804a86aec7915a1",
        "70807690fc5d629c5d9c5d3c1b31023a"],
    "golden_ra_preset_slow_416x240_qp30_f5.266": [
        "ab39c855229ac5307655c8479b4101fb",
        "748349d0cbb102483aff307c98d97190",
        "f9904b2e51df01d3d444819b979ecb39",
        "3509b864840bf26bb7333cb25f059925",
        "ec79a54823c88fe72ced49832e8934cb"],
    # slower-preset ALL-INTRA (deepest intra tool matrix + MTT 3) and a
    # 10-bit-input medium RA stream (InternalBitDepth path end to end)
    "golden_ai_preset_slower_416x240_qp30_f2.266": [
        "e01b61d606c4ad910850d60fe645379e",
        "44ffcecc4b43e24208f9b6ed9d33d41c"],
    "golden_ra_10bit_medium_416x240_qp30_f5.266": [
        "b8de0378e70648cfcd9e89aef340ab23",
        "49d6f76a075d0f31ed35ee5a9c495bc5",
        "e3643773497bbb29c4a0be44cc482c89",
        "2f23abb96fb134935a055c65c9abb1ab",
        "3053addab32753bcc1a84395742a2214"],
    # same full tool matrix with LMCS on top (mapped-domain coding with
    # every prediction path + chroma scaling with every residual path)
    "golden_ra_lmcs_combo_416x240_qp26_f9.266": [
        "c958fa84ec68b10e3db6ea65cb596673",
        "ca2051c6fd6721a7d8c1d7d1d1c10261",
        "adbc928b5da2abaeb669fc8d1793fc19",
        "bf23567cab9ad1e92128f1777782a4c4",
        "424b79d6d96e1db5f3a10286e9c8befc",
        "7895f71073043865b6273f38c105895d",
        "ba5817707fa805adfb9360346536c4bf",
        "6abf253075bd2ee38bd7c4eabd3d14d4",
        "f1aa4612988d1bc86ebce9a153a959f1"],
}


def _frame_hash(planes) -> str:
    buf = b"".join(planes[c].astype("<u2").tobytes() for c in (0, 1, 2))
    return hashlib.md5(buf).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN_HASHES))
def test_decode_reference_stream_bit_exact(name):
    with open(os.path.join(DATA, name), "rb") as f:
        frames = decode_stream(f.read())
    expected = GOLDEN_HASHES[name]
    assert len(frames) == len(expected)
    # reference --ReconFile output is in display (POC) order
    for frame, want in zip(sorted(frames, key=lambda fr: fr.poc), expected):
        assert _frame_hash(frame.planes) == want


def test_decoded_frame_shapes():
    with open(os.path.join(DATA,
                           "golden_ai_minimal_416x240_qp37_f1.266"), "rb") as f:
        frames = decode_stream(f.read())
    y = frames[0].planes[0]
    assert y.shape == (240, 416)
    assert frames[0].planes[1].shape == (120, 208)
    assert y.dtype == np.int32
    assert 0 <= y.min() and y.max() <= 1023
